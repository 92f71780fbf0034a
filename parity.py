#!/usr/bin/env python
"""Cross-framework accuracy-parity harness (VERDICT.md round-1 item 1).

Trains the REFERENCE's own torch model definitions (imported at runtime from an
upstream checkout — default /root/reference, never vendored into this repo) and
THIS framework side by side on the *identical* synthetic dataset, split, batch
schedule, parameter initialization, and optimization protocol (reference
trains.py:36-98: SGD momentum 0.9 wd 1e-4, cosine annealing, BCEDice or
LovaszHinge, deep-supervision loss averaging trains.py:118-124), then compares:

  1. per-epoch train-loss / train-IoU / val-IoU trajectories,
  2. final val IoU within a stated tolerance,
  3. converted-checkpoint eval equality BOTH directions through the torch
     converter (utils/torch_convert.py) — torch-trained weights evaluated by
     this framework and vice versa must produce matching logits.

Both sides start from the SAME weights (the torch init converted to flax), so
epoch-0 losses must agree to float tolerance; later epochs may drift through
floating-point chaos, which is why the gate is trajectory-shape + final IoU,
not bitwise equality.

    python parity.py --arch NestedUNet --deep_supervision true --epochs 15
    python parity.py --arch UNet --loss LovaszHingeLoss
    python parity.py --arch UNetRNN --decoder GRU   # CRDN recurrent decoder
    python parity.py --quick          # small preset used by the test suite

Requires a reference checkout (--reference) and torch (CPU is fine). Exits 0
and writes PARITY_RUN.json when every gate passes.

For the real-data protocol (README.md results table: DSB2018 96x96, IoU
0.839/0.842/0.843) run parity_dsb2018.sh the moment the dataset is available —
it executes the reference README protocol verbatim against this framework.
"""

import argparse
import copy
import importlib.util
import json
import math
import os
import sys

import numpy as np

IMAGENET_MEAN = np.asarray((0.485, 0.456, 0.406), np.float32)
IMAGENET_STD = np.asarray((0.229, 0.224, 0.225), np.float32)


# ---------------------------------------------------------------- dataset ----

def make_synthetic_dataset(n, hw, seed, num_classes=1, wd=None):
    """Deterministic segmentation task hard enough not to saturate instantly:
    1-3 rotated ellipses (green-tinted, moderate contrast) over a textured
    background, with bright red rectangles, plus pixel noise. At num_classes=1
    the rectangles are distractors that must NOT be segmented; at num_classes=2
    they become class 1 (multiclass per-channel masks, reference
    dataset.py:60-64 semantics). `wd` gives a non-square width (CA-Net's
    hardcoded 224x300 protocol, reference archs.py:853)."""
    rng = np.random.default_rng(seed)
    wd = wd or hw
    images = np.zeros((n, hw, wd, 3), np.uint8)
    masks = np.zeros((n, hw, wd, num_classes), np.uint8)
    yy, xx = np.mgrid[0:hw, 0:wd]
    for i in range(n):
        img = rng.integers(40, 120, (hw, wd, 3)).astype(np.float32)
        m = np.zeros((hw, wd), bool)
        for _ in range(int(rng.integers(1, 4))):
            cy = rng.integers(hw // 6, hw - hw // 6)
            cx = rng.integers(wd // 6, wd - wd // 6)
            ry, rx = rng.integers(max(2, hw // 12), max(3, hw // 5), 2)
            ang = rng.uniform(0, np.pi)
            ca, sa = np.cos(ang), np.sin(ang)
            u = (yy - cy) * ca + (xx - cx) * sa
            v = -(yy - cy) * sa + (xx - cx) * ca
            m |= (u / ry) ** 2 + (v / rx) ** 2 < 1.0
        img[m] += np.asarray([25, 60, 25], np.float32)
        rect = np.zeros((hw, wd), bool)
        if num_classes > 1 or rng.random() < 0.7:
            y0 = rng.integers(0, max(1, hw - hw // 4))
            x0 = rng.integers(0, max(1, wd - wd // 4))
            rect[y0:y0 + hw // 6, x0:x0 + wd // 6] = True
            img[rect] += np.asarray([70, 20, 20], np.float32)
        img += rng.normal(0, 12, img.shape)
        images[i] = np.clip(img, 0, 255).astype(np.uint8)
        masks[i, ..., 0] = m * np.uint8(255)
        if num_classes > 1:
            masks[i, ..., 1] = rect * np.uint8(255)
    return images, masks


def batch_schedule(n, batch, epochs, seed):
    """Per-epoch shuffled drop_last batch index arrays — the exact schedule fed
    to BOTH frameworks (reference DataLoader shuffle+drop_last semantics,
    trains.py:291-302)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(epochs):
        order = rng.permutation(n)
        out.append([order[s:s + batch]
                    for s in range(0, n - batch + 1, batch)])
    return out


def normalize_np(images_u8):
    """The full reference input transform: /255 -> albumentations Normalize ->
    the Dataset's extra /255 (reference trains.py:269-272 + dataset.py:71)."""
    x = images_u8.astype(np.float32) / 255.0
    return ((x - IMAGENET_MEAN) / IMAGENET_STD) / 255.0


def iou_np(logits, target, thr=0.5, smooth=1e-5):
    """Reference iou_score semantics (reference metrics.py:6-18): sigmoid >
    0.5 on output, > 0.5 on target, whole-batch intersection/union."""
    p = 1.0 / (1.0 + np.exp(-logits)) > thr
    t = target > thr
    inter = np.logical_and(p, t).sum()
    union = np.logical_or(p, t).sum()
    return float((inter + smooth) / (union + smooth))


def cosine_lr(epoch, base, epochs, min_lr):
    """torch CosineAnnealingLR closed form (reference trains.py:240-242)."""
    return min_lr + (base - min_lr) * (1 + math.cos(math.pi * epoch / epochs)) / 2


# ----------------------------------------------------------- torch trainer ---

def _import_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _torch_bce_dice(torch):
    """Reference BCEDiceLoss formula (reference losses.py:103-117):
    0.5 * BCEWithLogits + (1 - mean per-sample Dice), smooth 1e-5."""
    import torch.nn.functional as F

    def crit(output, target):
        bce = F.binary_cross_entropy_with_logits(output, target)
        smooth = 1e-5
        probs = torch.sigmoid(output)
        num = target.size(0)
        p = probs.view(num, -1)
        t = target.view(num, -1)
        inter = (p * t).sum(1)
        dice = (2.0 * inter + smooth) / (p.sum(1) + t.sum(1) + smooth)
        return 0.5 * bce + (1 - dice.sum() / num)

    return crit


def _import_ref_archs_py(ref_root):
    """Import the reference's archs.py with its unused module-level fastai
    import stubbed (archs.py:21 — only the dead DoubleUnet code needs it)."""
    import types

    stubbed = []
    for name in ("fastai", "fastai.vision"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.create_body = lambda *a, **k: None  # archs.py:1180 default arg
            sys.modules[name] = mod
            stubbed.append(name)
    try:
        return _import_module(os.path.join(ref_root, "archs.py"), "ref_archs")
    finally:
        for name in stubbed:
            sys.modules.pop(name, None)


def _import_ref_archs_backup(ref_root):
    """Import the reference's archs_backup.py with its unused module-level
    segmentation_refinement import stubbed (archs_backup.py:17 — only the PSP
    hybrids touch it, at forward time)."""
    import types

    stubbed = []
    for name in ("segmentation_refinement", "segmentation_refinement.models",
                 "segmentation_refinement.models.psp",
                 "segmentation_refinement.models.psp.pspnet"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            stubbed.append(name)
    try:
        return _import_module(os.path.join(ref_root, "archs_backup.py"),
                              "ref_archs_backup")
    finally:
        for name in stubbed:
            sys.modules.pop(name, None)


# Archs whose reference definitions live in CRDN.py and take a --decoder cell
# (CRDN.py ResNetRNN :418-587, VGG16RNN :250-407); UNetRNN* (archs1.py /
# archs_backup.py) also take one but export all three cells' convs.
_CRDN_BACKBONE_ARCHS = ("ResNet50RNN", "VGG16RNN")
_RDC_ARCHS = ("UNetRNN",) + _CRDN_BACKBONE_ARCHS


def _build_ref_model(ref_root, arch, ds_flag, decoder, num_classes=1):
    """The reference's own CPU-runnable definition of `arch`."""
    import torch

    if arch == "AttU_Net":
        # live in archs.py:1402-1474 (LeeJunHyun signature, not the trainer's)
        return _import_ref_archs_py(ref_root).AttU_Net(img_ch=3,
                                                       output_ch=num_classes)
    if arch == "R2AttU_Net":
        # live in archs.py:1322-1396: recurrent-residual RRCNN blocks (t=2)
        # + additive attention gates
        return _import_ref_archs_py(ref_root).R2AttU_Net(img_ch=3,
                                                         output_ch=num_classes)
    if arch in ("UNetRNNGhost", "UNetRM3", "UNetRM7", "UNetRNNCAttention"):
        # These live only in archs_backup.py (UNetRNNGhost :505-616, UNetRM3
        # :621-715, UNetRM7 :717-843, UNetRNNCAttention :1109-1250 — the CAM
        # channel-attention variant, the only dual-attention hybrid whose
        # reference definition can run: PAM's conv dims crash at forward;
        # the finished/archs2.py UNetRNNGhost copy
        # cannot even construct — filters[4] on a 4-element list,
        # archs2.py:496-510).  The module-level
        # `from segmentation_refinement...pspnet import *` (archs_backup.py:17)
        # is stubbed (only the PSP hybrids touch it, at forward time).  With
        # the vanilla decoder the RDC math is CPU-safe (archs_backup.py:219
        # casts .cpu()); the one remaining pin is the zero-state .cuda(0)
        # (:616/:715/:843), neutralized like the reference author's own CPU
        # edits (finished/archs1.py:339).
        if decoder != "vanilla":
            raise SystemExit(f"{arch} parity: the reference GRU branch "
                             "pins .cuda() (archs_backup.py:205); use the "
                             "CPU-safe vanilla decoder")
        backup = _import_ref_archs_backup(ref_root)
        cls = getattr(backup, arch)
        cls._init_cell_state = lambda self, t: torch.zeros(t.size())
        return cls(num_classes, input_channel=3, decoder=decoder)
    if arch == "ResNet50FCN":
        # Training equivalence is structurally unavailable here: the FCN
        # classifier carries two ACTIVE Dropout2d layers (CRDN.py:808/812)
        # whose channel-drop RNG streams are framework-private (and ours is
        # per-element nn.Dropout), so train-mode losses cannot agree
        # step-for-step; its custom normal_(0, sqrt(2/n)) init (CRDN.py:822-24)
        # also emits O(1e4+) logits that make the absolute logit gate
        # meaningless.  Eval-forward parity IS pinned, with a
        # magnitude-relative bound, in
        # tests/test_crdn_backbone_reference_parity.py::test_resnet50fcn_full_forward_parity.
        raise SystemExit("ResNet50FCN parity: active Dropout2d in the "
                         "classifier (CRDN.py:808/812) makes stepwise "
                         "training equivalence undefined; eval-forward parity "
                         "is covered by "
                         "test_crdn_backbone_reference_parity.py instead")
    if arch == "Comprehensive_Atten_Unet":
        # CA-Net (archs.py:844-959). Two neutralizations make the reference
        # definition CPU-runnable and the run deterministic, each the minimal
        # edit the reference author's own CPU pattern implies:
        #   1. UpCat's width-mismatch pad calls torch.rand(...).cuda()
        #      (archs.py:585-590) — a hard CUDA pin AND an unseeded noise
        #      injection on every forward (train and eval). Patched to edge
        #      replication, the documented intended-behavior divergence this
        #      framework implements (models/canet.py docstring).
        #   2. conv_block/SE_Conv_Block dropout: the reference creates a fresh
        #      nn.Dropout2d(0.5) module inside forward (archs.py:43-45, :684),
        #      which stays ACTIVE under model.eval() — reference eval logits
        #      are random, and train-mode channel-drop RNG is framework-
        #      private (the ResNet50FCN rationale), so stepwise equivalence
        #      is only defined with dropout off on BOTH sides. The instance
        #      flags are cleared here; our side runs drop_rate=0.
        import torch.nn.functional as F
        ref = _import_ref_archs_py(ref_root)

        def upcat_forward_cpu(self, inputs, down_outputs):
            outputs = self.up(down_outputs)
            dh = inputs.size(2) - outputs.size(2)
            dw = inputs.size(3) - outputs.size(3)
            if dh > 0 or dw > 0:
                outputs = F.pad(outputs, (0, max(dw, 0), 0, max(dh, 0)),
                                mode="replicate")
            return torch.cat([inputs, outputs], dim=1)

        ref.UpCat.forward = upcat_forward_cpu
        # `args` is only stored, never read (archs.py:848; out_size hardcoded
        # :853) — None is the honest value for a constructor arg the class
        # ignores. train_Canet.py:236 can't even construct it (zero args).
        model = ref.Comprehensive_Atten_Unet(None, in_ch=3,
                                             n_classes=num_classes)
        for m in model.modules():
            if getattr(m, "dropout", None) is True:
                m.dropout = False
        return model
    if arch == "ResNet50UNet":
        # CPU-safe as written: pure-conv unetUp decoder (CRDN.py:674-750),
        # no zero-state .cuda pin, no dropout.
        crdn = _import_module(os.path.join(ref_root, "CRDN.py"), "ref_crdn")
        return crdn.ResNet50UNet(n_classes=num_classes, input_channel=3)
    if arch in ("ResNet50RNN", "VGG16RNN"):
        # The CRDN backbone family lives in CRDN.py (ResNetRNN :418-587,
        # VGG16RNN :250-407) with the cleaner RDC (padding=k//2, CRDN.py:20).
        crdn = _import_module(os.path.join(ref_root, "CRDN.py"), "ref_crdn")
        if arch == "ResNet50RNN":
            if decoder == "LSTM":
                raise SystemExit(
                    "ResNet50RNN parity: the reference LSTM branch unpacks 6 "
                    "values from the 2-value RDC return (CRDN.py:558-563) and "
                    "crashes every forward; use vanilla or GRU")
            # _init_cell_state is already CPU-safe (the .cuda(0) is commented
            # out at CRDN.py:584)
            return crdn.ResNet50RNN(input_channel=3, n_classes=num_classes,
                                    kernel_size=3, decoder=decoder)
        model = crdn.VGG16RNN(input_channel=3, n_classes=num_classes,
                              kernel_size=3, decoder=decoder)
        # neutralize the hard zero-state .cuda(0) pin (CRDN.py:407) exactly
        # as the reference author's own CPU edits do (finished/archs1.py:339)
        model._init_cell_state = lambda t: torch.zeros(t.size())
        return model
    archs = _import_module(os.path.join(ref_root, "finished", "archs1.py"),
                           "ref_archs1")
    if arch == "UNetRNN":
        # third positional is kernel_size here (archs1.py:215), so build by kw
        return archs.UNetRNN(num_classes, input_channel=3, decoder=decoder)
    return getattr(archs, arch)(num_classes, 3, ds_flag)


def run_torch(ref_root, arch, ds_flag, loss_name, images, masks, schedule,
              val_idx, lr, min_lr, epochs, decoder="vanilla", num_classes=1):
    """Train the reference's own model definition with the reference protocol.
    Returns (init_state_dict, final_model, curves)."""
    import torch

    torch.manual_seed(0)
    model = _build_ref_model(ref_root, arch, ds_flag, decoder, num_classes)
    init_sd = copy.deepcopy(model.state_dict())

    if loss_name == "LovaszHingeLoss":
        ref_losses = _import_module(os.path.join(ref_root, "losses.py"),
                                    "ref_losses")
        crit = ref_losses.LovaszHingeLoss()
    else:
        crit = _torch_bce_dice(torch)

    opt = torch.optim.SGD(model.parameters(), lr=lr, momentum=0.9,
                          weight_decay=1e-4)

    imgs_n = normalize_np(images).transpose(0, 3, 1, 2)
    msks_n = (masks.astype(np.float32) / 255.0).transpose(0, 3, 1, 2)

    def as_t(a):
        return torch.from_numpy(np.ascontiguousarray(a))

    curves = {"loss": [], "iou": [], "val_loss": [], "val_iou": []}
    for epoch in range(epochs):
        for g in opt.param_groups:
            g["lr"] = cosine_lr(epoch, lr, epochs, min_lr)
        model.train()
        ep_loss, ep_iou, seen = 0.0, 0.0, 0
        for idx in schedule[epoch]:
            x, y = as_t(imgs_n[idx]), as_t(msks_n[idx])
            out = model(x)
            if ds_flag:  # avg loss over heads, IoU on the last (trains.py:118-124)
                loss = sum(crit(o, y) for o in out) / len(out)
                final = out[-1]
            else:
                loss, final = crit(out, y), out
            opt.zero_grad()
            loss.backward()
            opt.step()
            b = len(idx)
            ep_loss += float(loss.detach()) * b
            ep_iou += iou_np(final.detach().numpy(), y.numpy()) * b
            seen += b
        model.eval()
        with torch.no_grad():
            x, y = as_t(imgs_n[val_idx]), as_t(msks_n[val_idx])
            out = model(x)
            if ds_flag:
                vloss = sum(crit(o, y) for o in out) / len(out)
                final = out[-1]
            else:
                vloss, final = crit(out, y), out
            curves["val_loss"].append(float(vloss))
            curves["val_iou"].append(iou_np(final.numpy(), y.numpy()))
        curves["loss"].append(ep_loss / seen)
        curves["iou"].append(ep_iou / seen)
    return init_sd, model, curves


# ------------------------------------------------------------- jax trainer ---

def _converters(arch):
    """(torch->flax, flax->torch) pair for the arch (the CRDN family needs the
    index->attribute key shim)."""
    from pytorch_nested_unet_tpu.utils.torch_convert import converters_for_arch

    return converters_for_arch(arch)


def run_jax(arch, ds_flag, loss_name, init_sd, images, masks, schedule,
            val_idx, lr, min_lr, epochs, decoder="vanilla", num_classes=1):
    """Train THIS framework from the converted torch init on the same data and
    schedule. Returns (model, final_variables, curves)."""
    import jax
    import jax.numpy as jnp

    from pytorch_nested_unet_tpu import models
    from pytorch_nested_unet_tpu.training import (
        TrainState, build_optimizer, make_eval_step, make_train_step,
        set_learning_rate,
    )

    extra = ({"decoder": decoder}
             if arch in ("UNetRNN", "UNetRNNGhost", "UNetRM3", "UNetRM7",
                         "UNetRNNCAttention", "ResNet50RNN", "VGG16RNN")
             else {})
    if arch == "Comprehensive_Atten_Unet":
        # dropout off on both sides — see the CA-Net note in _build_ref_model
        extra = {"drop_rate": 0.0}
    model = models.create_model(arch, num_classes, 3, ds_flag, **extra)  # f32
    variables = _converters(arch)[0](init_sd)
    tx = build_optimizer("SGD", lr, 0.9, 1e-4)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, loss_name, ds_flag, augment=False,
                           donate=False)
    eval_step = make_eval_step(model, loss_name, ds_flag)

    imgs_d = jnp.asarray(images)
    msks_d = jnp.asarray(masks)
    key = jax.random.PRNGKey(0)  # unused: augment=False
    ones = jnp.ones((len(val_idx),), jnp.float32)

    curves = {"loss": [], "iou": [], "val_loss": [], "val_iou": []}
    for epoch in range(epochs):
        state = state.replace(opt_state=set_learning_rate(
            state.opt_state, cosine_lr(epoch, lr, epochs, min_lr)))
        ep_loss, ep_iou, seen = 0.0, 0.0, 0
        for idx in schedule[epoch]:
            i = jnp.asarray(idx)
            state, metrics = step(state, jnp.take(imgs_d, i, axis=0),
                                  jnp.take(msks_d, i, axis=0), key)
            b = len(idx)
            ep_loss += float(metrics["loss"]) * b
            ep_iou += float(metrics["iou"]) * b
            seen += b
        vm = eval_step(state.params, state.batch_stats,
                       jnp.take(imgs_d, jnp.asarray(val_idx), axis=0),
                       jnp.take(msks_d, jnp.asarray(val_idx), axis=0), ones)
        curves["loss"].append(ep_loss / seen)
        curves["iou"].append(ep_iou / seen)
        curves["val_loss"].append(float(vm["loss"]))
        curves["val_iou"].append(float(vm["iou"]))
    final = {"params": state.params, "batch_stats": state.batch_stats}
    return model, final, curves


# ------------------------------------------------------ converted-weights ----

def _dead_ref_key(arch, key, decoder="vanilla"):
    """Reference state_dict keys that are constructed but never used by any
    forward — our framework has no parameters for them, so export legitimately
    leaves them at the torch model's values (they cannot affect logits):
      - the `fc` classifier head of the ResNet backbones (CRDN.py:440) and
        VGG16RNN's trailing `score` conv (CRDN.py:353);
      - the RDC cell's gate convs for the decoders NOT selected — the
        reference constructs all of vanilla/GRU/LSTM's convs up front
        (archs1.py:160-165, CRDN.py:24-31) but only the chosen branch runs.
    """
    if arch.startswith("ResNet") and key.startswith("fc."):
        return True
    if arch == "VGG16RNN" and key.startswith("score."):
        return True
    # Only the CRDN.py backbone family needs the inactive-gate-conv allowlist
    # (its converters export just the selected cell's convs); the archs1/
    # archs_backup UNetRNN* exports round-trip ALL three cells' convs, so a
    # converter regression dropping those keys must FAIL the export-key gate.
    if arch not in _CRDN_BACKBONE_ARCHS:
        return False
    inactive = {"vanilla": (".gru_catconv.", ".gru_conv.", ".lstm_catconv."),
                "GRU": (".lstm_catconv.", ".vanilla_conv."),
                "LSTM": (".gru_catconv.", ".gru_conv.", ".vanilla_conv.")}
    return any(g in key for g in inactive.get(decoder, ()))


def cross_eval(torch_model, ds_flag, jax_model, jax_vars, images, masks,
               val_idx, arch="NestedUNet", decoder="vanilla"):
    """Converted-checkpoint eval equality both directions (VERDICT item 1):
    max |Δ logits| between frameworks evaluating the SAME weights."""
    import jax
    import jax.numpy as jnp
    import torch

    from pytorch_nested_unet_tpu.data.augment import eval_transform

    convert_reference_state_dict, export_reference_state_dict = _converters(arch)

    imgs_n = normalize_np(images[val_idx]).transpose(0, 3, 1, 2)
    x_t = torch.from_numpy(np.ascontiguousarray(imgs_n))
    imgs_u8 = jnp.asarray(images[val_idx])

    def jax_logits(variables):
        xj, _ = eval_transform(imgs_u8, jnp.zeros_like(imgs_u8))
        out = jax_model.apply({"params": variables["params"],
                               "batch_stats": variables["batch_stats"]},
                              xj, train=False)
        out = out[-1] if isinstance(out, (list, tuple)) else out
        return np.moveaxis(np.asarray(out), -1, 1)  # NHWC -> NCHW

    def torch_logits(m):
        m.eval()
        with torch.no_grad():
            out = m(x_t)
            out = out[-1] if isinstance(out, list) else out
        return out.numpy()

    # direction 1: torch-trained -> this framework
    v_from_torch = convert_reference_state_dict(
        copy.deepcopy(torch_model.state_dict()))
    d1 = float(np.abs(jax_logits(v_from_torch) - torch_logits(torch_model)).max())

    # direction 2: this framework -> torch
    sd = export_reference_state_dict(jax_vars)
    sd_t = {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()}
    missing, unexpected = torch_model.load_state_dict(sd_t, strict=False)
    bad = ([k for k in missing
            if "num_batches_tracked" not in k
            and not _dead_ref_key(arch, k, decoder)]
           + list(unexpected))
    if bad:
        raise RuntimeError(f"export key mismatch: {bad[:8]}")
    ours = jax_logits(jax_vars)
    d2 = float(np.abs(ours - torch_logits(torch_model)).max())
    # Logit magnitude contextualizes the absolute diffs: fp32 cross-framework
    # forward noise is ~2e-6 RELATIVE for every arch, so archs whose init
    # produces O(30) logits (e.g. ResNet50UNet's normal_(0, sqrt(2/n)) trunk,
    # reference CRDN.py:707-714) show absolute diffs ~100x a UNet's without
    # any semantic divergence.
    maxabs = float(np.abs(ours).max())
    return d1, d2, maxabs


# --------------------------------------------------------------------- main --

def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--reference", default="/root/reference",
                   help="path to an upstream reference checkout")
    p.add_argument("--arch", default="NestedUNet",
                   choices=["UNet", "NestedUNet", "UNetRNN", "UNetRNNGhost",
                            "UNetRM3", "UNetRM7", "AttU_Net", "R2AttU_Net",
                            "UNetRNNCAttention", "ResNet50RNN", "VGG16RNN",
                            "ResNet50UNet", "ResNet50FCN",
                            "Comprehensive_Atten_Unet"],
                   help="archs with CPU-runnable reference defs (reference "
                        "finished/archs1.py:11, finished/archs2.py:11, "
                        "archs.py:1402, archs_backup.py:1109, CRDN.py:250/418, "
                        "archs.py:844)")
    p.add_argument("--deep_supervision", default=False,
                   type=lambda v: str(v).lower() in ("1", "true", "t", "yes"))
    p.add_argument("--loss", default="BCEDiceLoss",
                   choices=["BCEDiceLoss", "LovaszHingeLoss"])
    p.add_argument("--decoder", default="vanilla",
                   choices=["vanilla", "GRU", "LSTM"],
                   help="RDC cell for the RDC archs (UNetRNN, ResNet50RNN, "
                        "VGG16RNN; reference default: vanilla, archs1.py:215) "
                        "— also scopes the CRDN dead-key allowlist")
    p.add_argument("--num_classes", default=1, type=int,
                   help="per-channel mask classes; 2 adds the rectangle as "
                        "class 1 (exercises multiclass heads and makes the "
                        "CAM channel gram non-degenerate)")
    p.add_argument("--epochs", default=15, type=int)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--size", default=48, type=int)
    p.add_argument("--size_w", default=0, type=int,
                   help="non-square width (0 = square). CA-Net forces 224x300 "
                        "— its SE pool windows are hardcoded to the ISIC2018 "
                        "shape (reference archs.py:614-628)")
    p.add_argument("--n_train", default=64, type=int)
    p.add_argument("--n_val", default=16, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--min_lr", default=1e-5, type=float)
    p.add_argument("--seed", default=41, type=int)
    p.add_argument("--tol_iou", default=0.05, type=float,
                   help="max allowed |final val IoU (torch) - (ours)|")
    p.add_argument("--tol_first_loss", default=2e-3, type=float,
                   help="max allowed epoch-0 train-loss gap (same init + data "
                        "=> must agree before float chaos accumulates)")
    p.add_argument("--tol_logits", default=5e-4, type=float,
                   help="max allowed |Δ logits| for converted weights")
    p.add_argument("--out", default="PARITY_RUN.json")
    p.add_argument("--quick", action="store_true",
                   help="small preset (UNet 32x32, 4 epochs) for CI")
    p.add_argument("--platform", default="cpu",
                   help="jax platform for our side (default cpu: exact f32 "
                        "accumulation matching the torch CPU reference run; "
                        "'default' keeps jax's pick, e.g. an attached TPU)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.quick:
        args.arch, args.deep_supervision = "UNet", False
        args.epochs, args.batch_size, args.size = 4, 4, 32
        args.n_train, args.n_val = 16, 8
    if args.arch == "Comprehensive_Atten_Unet":
        # the reference's SE pool windows only admit the ISIC2018 shape
        # (archs.py:614-628), n_classes=1 would hit Softmax2d-over-one-channel
        # (constant output, archs.py:900), and its own trainer uses batch 2
        # (train_Canet.py:45)
        args.size, args.size_w = 224, 300
        args.num_classes = max(args.num_classes, 2)
        args.batch_size = min(args.batch_size, 2)
    if not os.path.isfile(os.path.join(args.reference, "finished", "archs1.py")):
        sys.exit(f"no reference checkout at {args.reference} "
                 f"(expected finished/archs1.py)")

    # parity needs exact f32 conv accumulation on both sides
    from pytorch_nested_unet_tpu.utils.backend import configure_backend
    configure_backend(args.platform)
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")

    n = args.n_train + args.n_val
    images, masks = make_synthetic_dataset(n, args.size, args.seed,
                                           args.num_classes,
                                           wd=args.size_w or None)
    val_idx = np.arange(args.n_train, n)
    schedule = batch_schedule(args.n_train, args.batch_size, args.epochs,
                              args.seed)

    print(f"parity: {args.arch}{' wDS' if args.deep_supervision else ''} "
          f"{' ' + args.decoder if args.arch in _RDC_ARCHS else ''}"
          f"{args.loss} {args.size}x{args.size_w or args.size} "
          f"train {args.n_train} / val {args.n_val} batch {args.batch_size} "
          f"epochs {args.epochs}")

    init_sd, torch_model, ref = run_torch(
        args.reference, args.arch, args.deep_supervision, args.loss,
        images, masks, schedule, val_idx, args.lr, args.min_lr, args.epochs,
        decoder=args.decoder, num_classes=args.num_classes)
    jax_model, jax_vars, ours = run_jax(
        args.arch, args.deep_supervision, args.loss, init_sd,
        images, masks, schedule, val_idx, args.lr, args.min_lr, args.epochs,
        decoder=args.decoder, num_classes=args.num_classes)

    print(f"{'ep':>3} {'ref loss':>9} {'our loss':>9} {'Δloss':>8} "
          f"{'ref vIoU':>9} {'our vIoU':>9}")
    for e in range(args.epochs):
        print(f"{e:>3} {ref['loss'][e]:>9.4f} {ours['loss'][e]:>9.4f} "
              f"{abs(ref['loss'][e] - ours['loss'][e]):>8.4f} "
              f"{ref['val_iou'][e]:>9.4f} {ours['val_iou'][e]:>9.4f}")

    d1, d2, logits_maxabs = cross_eval(
        torch_model, args.deep_supervision, jax_model, jax_vars, images,
        masks, val_idx, arch=args.arch, decoder=args.decoder)

    first_gap = abs(ref["loss"][0] - ours["loss"][0])
    final_gap = abs(ref["val_iou"][-1] - ours["val_iou"][-1])
    # best-val-IoU checkpoint agreement: the reference's model-selection rule
    # is "keep the epoch with the best val IoU" (trains.py:344-349), so the
    # number its README table reports is the BEST-epoch IoU, not the final —
    # gate that the two frameworks' best checkpoints agree too.
    ref_best_ep = int(np.argmax(ref["val_iou"]))
    our_best_ep = int(np.argmax(ours["val_iou"]))
    best_gap = abs(ref["val_iou"][ref_best_ep] - ours["val_iou"][our_best_ep])
    checks = {
        "epoch0_train_loss_gap": {
            "value": first_gap, "tol": args.tol_first_loss,
            "ok": first_gap <= args.tol_first_loss},
        "final_val_iou_gap": {
            "value": final_gap, "tol": args.tol_iou,
            "ok": final_gap <= args.tol_iou},
        "best_val_iou_gap": {
            "value": best_gap, "tol": args.tol_iou,
            "ok": best_gap <= args.tol_iou},
        "torch_to_ours_logits_maxdiff": {
            "value": d1, "tol": args.tol_logits, "ok": d1 <= args.tol_logits},
        "ours_to_torch_logits_maxdiff": {
            "value": d2, "tol": args.tol_logits, "ok": d2 <= args.tol_logits},
    }
    # Informational (not a gate): magnitude + relative precision of the
    # cross-framework logits, so large-logit archs are comparable to O(1) ones.
    logits_context = {
        "logits_maxabs": logits_maxabs,
        "torch_to_ours_logits_reldiff": d1 / max(logits_maxabs, 1e-12),
        "ours_to_torch_logits_reldiff": d2 / max(logits_maxabs, 1e-12),
    }
    ok = all(c["ok"] for c in checks.values())
    result = {
        "config": {k: getattr(args, k) for k in
                   ("arch", "deep_supervision", "decoder", "loss",
                    "num_classes", "epochs", "batch_size", "size", "size_w",
                    "n_train", "n_val", "lr", "seed")},
        "reference_curves": ref,
        "our_curves": ours,
        "best_checkpoint": {
            "ref_best_epoch": ref_best_ep,
            "ref_best_val_iou": ref["val_iou"][ref_best_ep],
            "ours_best_epoch": our_best_ep,
            "ours_best_val_iou": ours["val_iou"][our_best_ep],
        },
        "checks": checks,
        "logits_context": logits_context,
        "ok": ok,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    for name, c in checks.items():
        print(f"{'PASS' if c['ok'] else 'FAIL'} {name}: "
              f"{c['value']:.6f} (tol {c['tol']})")
    print(f"{'PARITY OK' if ok else 'PARITY FAILED'} -> {args.out}")
    if not ok:
        sys.exit(1)
    return result


if __name__ == "__main__":
    main()
