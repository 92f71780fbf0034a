"""Extended model zoo: shapes, param-count parity, and numeric parity of the
new building blocks (RDC, Ghost, PAM/CAM, attention gates, MHSA) against
independent PyTorch fixtures implementing the published formulas.

Reference param counts were measured from the reference repo's own class
definitions (archs_backup.py / archs.py, torch CPU). Documented divergences
(SURVEY.md §7 quirk policy):
  - The reference RDC constructs all three decoders' gate convs but uses one
    (archs_backup.py:170-178); ours only materializes the active branch. For
    hidden_dim=1, k=3 the dead params are 95 (GRU/LSTM) / 133 (vanilla).
  - UNetRNNPAttention's torch PAMs are built with filters[i] channels but
    applied to n_classes-channel score maps (archs_backup.py:997-1001 vs
    :1042-1052) — crashes in torch; ours attends over the actual score maps.
  - Attention_block builds PAM/CAM inside forward (untrained, uncounted);
    ours registers them as real submodules.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from pytorch_nested_unet_tpu import models

pytestmark = pytest.mark.slow  # multi-minute: see pyproject fast lane


def _param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def _t2f_conv(w):  # torch (out,in,kh,kw) -> flax (kh,kw,in,out)
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


ALL_NEW_ARCHS = [
    "UNetRNN", "UNetRM3", "UNetRM7", "UNetRNNGhost", "UNetRNNPAttention",
    "UNetRNNCAttention", "UNetRNNAttention", "AttU_Net", "R2U_Net", "R2AttU_Net",
]


@pytest.mark.parametrize("arch", ALL_NEW_ARCHS)
def test_forward_shapes(arch):
    hw = 64 if arch == "UNetRM7" else 32
    x = jnp.zeros((2, hw, hw, 3), jnp.float32)
    model = models.create_model(arch, num_classes=1)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, hw, hw, 1)
    assert out.dtype == jnp.float32


def test_param_counts_match_reference():
    # (arch, reference torch count, dead params we intentionally don't create)
    cases = [
        ("UNetRNN", 1_193_319, 95),           # unused LSTM+vanilla gate convs
        ("UNetRM3", 297_017, 95),
        ("UNetRM7", 4_749_901, 95),
        ("UNetRNNGhost", 1_210_615, 133),     # vanilla decoder: unused GRU+LSTM convs
        ("UNetRNNCAttention", 1_193_324, 95),
        ("AttU_Net", 34_878_573, 0),
        ("R2AttU_Net", 39_442_925, 0),
    ]
    for arch, ref, dead in cases:
        hw = 64 if arch == "UNetRM7" else 32
        x = jnp.zeros((1, hw, hw, 3), jnp.float32)
        m = models.create_model(arch, num_classes=1)
        v = m.init(jax.random.PRNGKey(0), x, train=True)
        assert _param_count(v["params"]) == ref - dead, arch


@pytest.mark.parametrize("decoder", ["GRU", "LSTM", "vanilla"])
def test_rdc_matches_torch(decoder, rng):
    """RDC cell vs a torch fixture of the published gated-conv formulas
    (reference archs_backup.py:155-227)."""
    hid, k = 2, 3
    x_cur = rng.standard_normal((2, 8, 8, hid)).astype(np.float32)
    h_pre = rng.standard_normal((2, 4, 4, hid)).astype(np.float32)
    c_pre = rng.standard_normal((2, 4, 4, hid)).astype(np.float32)

    cell = models.RDC(hidden_dim=hid, kernel_size=k, decoder=decoder)
    if decoder == "LSTM":
        variables = cell.init(jax.random.PRNGKey(0), jnp.asarray(x_cur),
                              jnp.asarray(h_pre), jnp.asarray(c_pre))
    else:
        variables = cell.init(jax.random.PRNGKey(0), jnp.asarray(x_cur),
                              jnp.asarray(h_pre))

    tx = torch.tensor(x_cur.transpose(0, 3, 1, 2))
    th = torch.tensor(h_pre.transpose(0, 3, 1, 2))
    tc = torch.tensor(c_pre.transpose(0, 3, 1, 2))
    th_up = F.interpolate(th, size=(8, 8), mode="bilinear", align_corners=True)
    tc_up = F.interpolate(tc, size=(8, 8), mode="bilinear", align_corners=True)

    def mk_conv(out_ch, pname):
        conv = tnn.Conv2d(hid * 2, out_ch, k, padding=k // 2)
        p = variables["params"][pname]["conv"]
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(
                np.asarray(p["kernel"]).transpose(3, 2, 0, 1)))
            conv.bias.copy_(torch.tensor(np.asarray(p["bias"])))
        return conv

    with torch.no_grad():
        if decoder == "GRU":
            catconv = mk_conv(hid * 2, "gru_catconv")
            conv = mk_conv(hid, "gru_conv")
            rz = catconv(torch.cat([th_up, tx], 1))
            r, z = torch.sigmoid(rz[:, :hid]), torch.sigmoid(rz[:, hid:])
            h_hat = torch.tanh(conv(torch.cat([tx, r * th_up], 1)))
            expect = z * th_up + (1 - z) * h_hat
            got = cell.apply(variables, jnp.asarray(x_cur), jnp.asarray(h_pre))
        elif decoder == "LSTM":
            catconv = mk_conv(hid * 4, "lstm_catconv")
            gates = catconv(torch.cat([th_up, tx], 1))
            ci, cf, co, cg = torch.split(gates, hid, dim=1)
            c = torch.sigmoid(cf) * tc_up + torch.sigmoid(ci) * torch.tanh(cg)
            expect = torch.sigmoid(co) * torch.tanh(c)
            got, got_c = cell.apply(variables, jnp.asarray(x_cur),
                                    jnp.asarray(h_pre), jnp.asarray(c_pre))
            np.testing.assert_allclose(
                np.asarray(got_c), c.numpy().transpose(0, 2, 3, 1), atol=2e-5)
        else:
            conv = mk_conv(hid, "vanilla_conv")
            expect = torch.relu(conv(torch.cat([th_up, tx], 1)))
            got = cell.apply(variables, jnp.asarray(x_cur), jnp.asarray(h_pre))

    np.testing.assert_allclose(np.asarray(got),
                               expect.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_ghost_module_matches_torch(rng):
    """GhostModule primary+cheap-depthwise vs torch (reference archs_backup.py:430-454)."""
    inp, oup = 8, 6
    x = rng.standard_normal((2, 8, 8, inp)).astype(np.float32)
    gm = models.GhostModule(oup=oup)
    variables = gm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    p = variables["params"]

    init_ch = 3  # ceil(6/2)
    prim = tnn.Conv2d(inp, init_ch, 1, bias=False)
    cheap = tnn.Conv2d(init_ch, init_ch, 3, padding=1, groups=init_ch, bias=False)
    with torch.no_grad():
        prim.weight.copy_(torch.tensor(
            np.asarray(p["primary_conv"]["conv"]["kernel"]).transpose(3, 2, 0, 1)))
        cheap.weight.copy_(torch.tensor(
            np.asarray(p["cheap_conv"]["conv"]["kernel"]).transpose(3, 2, 0, 1)))
        tx = torch.tensor(x.transpose(0, 3, 1, 2))
        x1 = F.relu(F.batch_norm(prim(tx), torch.zeros(init_ch), torch.ones(init_ch),
                                 torch.ones(init_ch), torch.zeros(init_ch), eps=1e-5))
        x2 = F.relu(F.batch_norm(cheap(x1), torch.zeros(init_ch), torch.ones(init_ch),
                                 torch.ones(init_ch), torch.zeros(init_ch), eps=1e-5))
        expect = torch.cat([x1, x2], 1)[:, :oup]

    got = gm.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got),
                               expect.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_pam_cam_match_torch(rng):
    """PAM/CAM einsum formulations vs torch bmm (reference archs_backup.py:876-947)."""
    c = 8
    x = rng.standard_normal((2, 6, 6, c)).astype(np.float32)
    tx = torch.tensor(x.transpose(0, 3, 1, 2))

    pam = models.PAMModule()
    variables = pam.init(jax.random.PRNGKey(1), jnp.asarray(x))
    # overwrite gamma to a nonzero value so the attention path is exercised
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    params["gamma"] = np.array([0.7], np.float32)

    qc = tnn.Conv2d(c, c // 8, 1)
    kc = tnn.Conv2d(c, c // 8, 1)
    vc = tnn.Conv2d(c, c, 1)
    with torch.no_grad():
        for tconv, name in [(qc, "query_conv"), (kc, "key_conv"), (vc, "value_conv")]:
            tconv.weight.copy_(torch.tensor(
                params[name]["conv"]["kernel"].transpose(3, 2, 0, 1)))
            tconv.bias.copy_(torch.tensor(params[name]["conv"]["bias"]))
        b, _, h, w = tx.shape
        q = qc(tx).view(b, -1, h * w).permute(0, 2, 1)
        k = kc(tx).view(b, -1, h * w)
        att = torch.softmax(torch.bmm(q, k), dim=-1)
        v = vc(tx).view(b, -1, h * w)
        out = torch.bmm(v, att.permute(0, 2, 1)).view(b, c, h, w)
        expect_pam = 0.7 * out + tx

    got = pam.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got),
                               expect_pam.numpy().transpose(0, 2, 3, 1), atol=2e-5)

    cam = models.CAMModule()
    cvars = cam.init(jax.random.PRNGKey(0), jnp.asarray(x))
    cparams = jax.tree_util.tree_map(np.asarray, cvars["params"])
    cparams["gamma"] = np.array([0.3], np.float32)
    with torch.no_grad():
        b, C, h, w = tx.shape
        pq = tx.view(b, C, -1)
        energy = torch.bmm(pq, pq.permute(0, 2, 1))
        energy_new = torch.max(energy, -1, keepdim=True)[0].expand_as(energy) - energy
        att = torch.softmax(energy_new, dim=-1)
        out = torch.bmm(att, pq).view(b, C, h, w)
        expect_cam = 0.3 * out + tx
    got = cam.apply({"params": cparams}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got),
                               expect_cam.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_attention_gate_matches_torch(rng):
    """Additive attention gate vs torch (reference archs.py:1293-1321)."""
    from pytorch_nested_unet_tpu.models.attention_unet import AttentionGate

    fg = fl = 6
    fint = 3
    g = rng.standard_normal((2, 8, 8, fg)).astype(np.float32)
    x = rng.standard_normal((2, 8, 8, fl)).astype(np.float32)

    gate = AttentionGate(inter_channels=fint)
    variables = gate.init(jax.random.PRNGKey(0), jnp.asarray(g), jnp.asarray(x),
                          train=False)
    p = variables["params"]

    wg = tnn.Conv2d(fg, fint, 1)
    wx = tnn.Conv2d(fl, fint, 1)
    psi = tnn.Conv2d(fint, 1, 1)
    with torch.no_grad():
        for tconv, name in [(wg, "W_g_conv"), (wx, "W_x_conv"), (psi, "psi_conv")]:
            tconv.weight.copy_(torch.tensor(
                np.asarray(p[name]["conv"]["kernel"]).transpose(3, 2, 0, 1)))
            tconv.bias.copy_(torch.tensor(np.asarray(p[name]["conv"]["bias"])))
        tg = torch.tensor(g.transpose(0, 3, 1, 2))
        txx = torch.tensor(x.transpose(0, 3, 1, 2))

        def bn(y):
            ch = y.shape[1]
            return F.batch_norm(y, torch.zeros(ch), torch.ones(ch),
                                torch.ones(ch), torch.zeros(ch), eps=1e-5)

        a = F.relu(bn(wg(tg)) + bn(wx(txx)))
        expect = txx * torch.sigmoid(bn(psi(a)))

    got = gate.apply(variables, jnp.asarray(g), jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got),
                               expect.numpy().transpose(0, 2, 3, 1), atol=2e-5)


@pytest.mark.parametrize("layer_type,scale", [("SAME", 1), ("DOWN", 0.5), ("UP", 2)])
def test_mhsa_2d_shapes_and_softmax(layer_type, scale, rng):
    """multi_head_attention_2d output shapes per layer_type (reference
    archs.py:964-1077); attention rows sum to 1."""
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    m = models.MultiHeadAttention2D(key_filters=16, value_filters=16,
                                    output_filters=10, num_heads=2,
                                    layer_type=layer_type)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    out = m.apply(variables, jnp.asarray(x), train=False)
    assert out.shape == (2, int(8 * scale), int(8 * scale), 10)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_rnn_decoder_variants_differ(rng):
    """GRU/LSTM/vanilla decoders give different (all-finite) outputs."""
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    outs = []
    for dec in ["GRU", "LSTM", "vanilla"]:
        m = models.UNetRNN(num_classes=1, decoder=dec)
        v = m.init(jax.random.PRNGKey(0), x, train=True)
        out = np.asarray(m.apply(v, x, train=False))
        assert np.isfinite(out).all()
        outs.append(out)
    assert not np.allclose(outs[0], outs[1])
    assert not np.allclose(outs[0], outs[2])


def test_zoo_models_trainable():
    """One SGD step decreases nothing catastrophically: grads exist and are finite
    for a representative of each family."""
    from pytorch_nested_unet_tpu.losses import bce_dice_loss

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    y = jnp.asarray((np.random.default_rng(1).random((2, 32, 32, 1)) > 0.5),
                    jnp.float32)
    for arch in ["UNetRNN", "UNetRNNGhost", "UNetRNNAttention", "AttU_Net"]:
        model = models.create_model(arch, num_classes=1)
        variables = model.init(jax.random.PRNGKey(0), x, train=True)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return bce_dice_loss(out, y)

        grads = jax.grad(loss_fn)(variables["params"])
        flat = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat), arch
        assert any(np.abs(np.asarray(g)).max() > 0 for g in flat), arch
