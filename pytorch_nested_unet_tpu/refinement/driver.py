"""CascadePSP inference driver: global pass + sliding-window local refinement.

Reference: segmentation-refinement/segmentation_refinement/eval_helper.py:1-192
(resize_max_side :4-11, safe_forward pad-to-/8 :13-45, process_high_res_im
:47-168, process_im_single_pass :171-192). The same helpers are duplicated
inside the reference model file at archs_backup.py:1550-1716.

TPU-native formulation: the crop loop stays in Python on the host (it is
data-dependent — trivial tiles are skipped, eval_helper.py:124-127) but every
crop has the SAME static L x L shape, so the jitted RefinementModule compiles
once and each tile is one device step; tile accumulation/averaging happens in
numpy on the host exactly like the reference's CPU-side torch ops.
"""

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_area, resize_bicubic, resize_bilinear


def resize_max_side(im, size, method):
    """Scale so the longer side == round(shorter*ratio) like torch's
    scale_factor path (reference eval_helper.py:4-11)."""
    h, w = im.shape[-3], im.shape[-2]
    ratio = size / max(h, w)
    out_hw = (int(h * ratio), int(w * ratio))
    if method == "bilinear":
        return resize_bilinear(im, out_hw, align_corners=False)
    if method == "bicubic":
        return resize_bicubic(im, out_hw, align_corners=False)
    if method == "area":
        return resize_area(im, out_hw)
    raise ValueError(method)


def safe_forward(apply_fn, im, seg, inter_s8=None, inter_s4=None):
    """Zero-pad image (and -1-pad segs) to multiples of 8, run, crop back
    (reference eval_helper.py:13-45)."""
    b, ph, pw = seg.shape[0], seg.shape[-3], seg.shape[-2]
    if ph % 8 != 0 or pw % 8 != 0:
        new_h = (ph // 8 + 1) * 8
        new_w = (pw // 8 + 1) * 8
        pad = ((0, 0), (0, new_h - ph), (0, new_w - pw), (0, 0))
        im = jnp.pad(im, pad)
        seg = jnp.pad(seg, pad, constant_values=-1.0)
        if inter_s8 is not None:
            inter_s8 = jnp.pad(inter_s8, pad, constant_values=-1.0)
        if inter_s4 is not None:
            inter_s4 = jnp.pad(inter_s4, pad, constant_values=-1.0)
    images = apply_fn(im, seg, inter_s8, inter_s4)
    return {k: images[k][:, :ph, :pw, :] for k in ("pred_224", "pred_28_3", "pred_56_2")}


def process_im_single_pass(apply_fn, im, seg, L: int = 900):
    """Global-only fast path (reference eval_helper.py:171-192)."""
    h, w = im.shape[-3], im.shape[-2]
    if max(h, w) < L:
        im = resize_max_side(im, L, "bicubic")
        seg = resize_max_side(seg, L, "bilinear")
    elif max(h, w) > L:
        im = resize_max_side(im, L, "area")
        seg = resize_max_side(seg, L, "area")
    images = safe_forward(apply_fn, im, seg)
    pred = images["pred_224"]
    if max(h, w) < L:
        pred = resize_area(pred, (h, w))
    elif max(h, w) > L:
        pred = resize_bilinear(pred, (h, w), align_corners=True)
    return pred


def process_high_res_im(apply_fn, im, seg, L: int = 900, mesh=None,
                        tile_batch: Optional[int] = None):
    """Global step then stride-L/2 sliding-window local step with 16-px overlap
    trim, trivial-tile skipping, overlap averaging, and where-fallback to the
    global prediction (reference eval_helper.py:47-168).

    Tile execution modes (all numerically identical — tiles are independent
    and accumulation is an order-free sum):
      - default: one device step per tile (compiles once; reference semantics)
      - tile_batch=k: tiles stacked k at a time along the batch axis — k MXU
        steps per dispatch instead of 1
      - mesh=Mesh(..., 'data'): tile batches sharded over the mesh's 'data'
        axis (tile_batch defaults to the device count) — the sliding-window
        pass fans out across chips, the CNN-inference analogue of sequence
        parallelism for inputs too large for one chip's step budget
    """
    stride = L // 2
    h, w = seg.shape[-3], seg.shape[-2]

    # Global step
    if max(h, w) > L:
        im_small = resize_max_side(im, L, "area")
        seg_small = resize_max_side(seg, L, "area")
    elif max(h, w) < L:
        im_small = resize_max_side(im, L, "bicubic")
        seg_small = resize_max_side(seg, L, "bilinear")
    else:
        im_small, seg_small = im, seg
    images = safe_forward(apply_fn, im_small, seg_small)
    pred_224 = images["pred_224"]
    pred_56 = images["pred_56_2"]

    # Local step at the original resolution
    im_small = np.asarray(resize_max_side(im, max(h, w), "area"))
    seg_small = np.asarray(resize_max_side(seg, max(h, w), "area"))
    h2, w2 = seg_small.shape[-3], seg_small.shape[-2]

    combined_224 = np.zeros_like(seg_small)
    combined_weight = np.zeros_like(seg_small)

    r_pred_224 = (np.asarray(resize_bilinear(pred_224, (h2, w2),
                                             align_corners=False)) > 0.5
                  ).astype(np.float32) * 2 - 1
    r_pred_56 = np.asarray(resize_bilinear(pred_56, (h2, w2),
                                           align_corners=False)) * 2 - 1

    padding = 16
    step_size = stride - padding * 2
    step_len = L

    # Phase 1: select non-trivial tiles (host-side, data-dependent —
    # reference eval_helper.py:124-127). All selected tiles share one shape.
    tiles = []
    used_start_idx = {}
    for x_idx in range(w2 // step_size + 1):
        for y_idx in range(h2 // step_size + 1):
            start_x = x_idx * step_size
            start_y = y_idx * step_size
            end_x = start_x + step_len
            end_y = start_y + step_len
            if end_y > h2:
                end_y = h2
                start_y = h2 - step_len
            if end_x > w2:
                end_x = w2
                start_x = w2 - step_len
            start_x, start_y = max(0, start_x), max(0, start_y)
            end_x, end_y = min(w2, end_x), min(h2, end_y)

            start_idx = start_y * w2 + start_x
            if start_idx in used_start_idx:
                continue
            used_start_idx[start_idx] = True

            seg_224_part = r_pred_224[:, start_y:end_y, start_x:end_x, :]
            seg_part_norm = (seg_224_part > 0).astype(np.float32)
            if seg_part_norm.mean() > 0.9 or seg_part_norm.mean() < 0.1:
                continue
            tiles.append((start_x, start_y, end_x, end_y))

    # Phase 2: run the refinement net over the tiles and overlap-accumulate.
    def accumulate(tile, grid_pred_224):
        start_x, start_y, end_x, end_y = tile
        pred_sx = pred_sy = 0
        pred_ex = pred_ey = step_len
        if start_x != 0:
            start_x += padding
            pred_sx += padding
        if start_y != 0:
            start_y += padding
            pred_sy += padding
        if end_x != w2:
            end_x -= padding
            pred_ex -= padding
        if end_y != h2:
            end_y -= padding
            pred_ey -= padding
        combined_224[:, start_y:end_y, start_x:end_x, :] += \
            grid_pred_224[:, pred_sy:pred_ey, pred_sx:pred_ex, :]
        combined_weight[:, start_y:end_y, start_x:end_x, :] += 1

    def parts_of(tile):
        start_x, start_y, end_x, end_y = tile
        return (im_small[:, start_y:end_y, start_x:end_x, :],
                r_pred_224[:, start_y:end_y, start_x:end_x, :],
                r_pred_56[:, start_y:end_y, start_x:end_x, :])

    if mesh is None and tile_batch is None:
        for tile in tiles:  # one device step per tile (reference semantics)
            im_part, seg224, seg56 = parts_of(tile)
            grid_images = safe_forward(apply_fn, jnp.asarray(im_part),
                                       jnp.asarray(seg224), jnp.asarray(seg56))
            accumulate(tile, np.asarray(grid_images["pred_224"]))
    elif tiles:
        n_dev = int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
        group = tile_batch or n_dev
        if mesh is not None:
            group = max(group, n_dev)
            group += (-group) % n_dev  # divisible by the mesh size
        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            sharding = NamedSharding(mesh, PartitionSpec("data", None, None, None))
        for s in range(0, len(tiles), group):
            chunk = tiles[s:s + group]
            pad = group - len(chunk)  # last chunk padded: one compiled shape
            columns = list(zip(*(parts_of(t) for t in chunk)))  # im, seg224, seg56
            batches = []
            for col in columns:
                a = np.concatenate(list(col) + [col[-1]] * pad, axis=0)
                batches.append(jnp.asarray(a) if sharding is None
                               else jax.device_put(jnp.asarray(a), sharding))
            grid_images = safe_forward(apply_fn, *batches)
            preds = np.asarray(grid_images["pred_224"])
            for j, tile in enumerate(chunk):
                accumulate(tile, preds[j:j + 1])

    seg_norm = r_pred_224 / 2 + 0.5
    with np.errstate(invalid="ignore", divide="ignore"):
        averaged = combined_224 / combined_weight
    pred = np.where(combined_weight == 0, seg_norm, averaged)

    return resize_bilinear(jnp.asarray(pred), (h, w), align_corners=True)
