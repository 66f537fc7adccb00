"""Evaluation metrics (reference ``evals/utils/metrics.py`` + ``metric.py``)
as functional jnp, returning pytrees instead of mutated dicts.

Conventions: depth maps are (B, H, W) or (B, H, W, 1); normals (B, H, W, 3);
segmentation maps (B, H, W) int panoptic ids (OneFormer ADE20k-150).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# OneFormer ADE20k panoptic id split (reference
# ``evals/utils/oneformer_id2label.py:154-206``)
STUFF = (0, 1, 2, 3, 4, 5, 6, 9, 13, 16, 21, 26, 29, 46, 52, 60, 91, 94, 96,
         106, 113, 128)
THINGS = tuple(i for i in range(150) if i not in STUFF and i not in (11, 17, 40, 68))
# ids absent from both reference lists: {11, 17, 40, 68} — kept excluded


def _squeeze_chan(x):
    return x[..., 0] if x.ndim == 4 and x.shape[-1] == 1 else x


def _safe_div(num, den, eps=1e-6):
    return num / jnp.where(den == 0, eps, den)


def match_scale_and_shift(prediction, target):
    """Closed-form per-image least-squares scale/shift alignment
    (``metrics.py:742-780``)."""
    four_chan = prediction.ndim == 4
    prediction = _squeeze_chan(prediction)
    target = _squeeze_chan(target)

    mask = (target > 0).astype(jnp.float32)
    a_00 = jnp.sum(mask * prediction * prediction, axis=(1, 2))
    a_01 = jnp.sum(mask * prediction, axis=(1, 2))
    a_11 = jnp.sum(mask, axis=(1, 2))
    b_0 = jnp.sum(mask * prediction * target, axis=(1, 2))
    b_1 = jnp.sum(mask * target, axis=(1, 2))

    det = a_00 * a_11 - a_01 * a_01
    valid = det != 0
    safe_det = jnp.where(valid, det, 1.0)
    scale = jnp.where(valid, (a_11 * b_0 - a_01 * b_1) / safe_det, 1.0)
    shift = jnp.where(valid, (-a_01 * b_0 + a_00 * b_1) / safe_det, 0.0)
    out = prediction * scale[:, None, None] + shift[:, None, None]
    return out[..., None] if four_chan else out


def depth_rmse(depth_pr, depth_gt, image_average=False):
    """``metrics.py:30-51``."""
    depth_pr, depth_gt = _squeeze_chan(depth_pr), _squeeze_chan(depth_gt)
    valid = (depth_gt > 0).astype(jnp.float32)
    num_valid = jnp.clip(valid.sum(axis=(1, 2)), 1, None)
    sq = (depth_gt - depth_pr) ** 2
    rmse = jnp.sqrt((sq * valid).sum(axis=(1, 2)) / num_valid)
    return rmse.mean() if image_average else rmse


def _threshold_metrics(depth_pr, depth_gt, mask):
    """d1/d2/d3 + rmse under an arbitrary pixel mask; returns dict of (B,)."""
    num = mask.sum(axis=(1, 2))
    thresh = jnp.maximum(
        depth_gt / jnp.clip(depth_pr, 1e-9, None),
        depth_pr / jnp.clip(depth_gt, 1e-9, None),
    )
    out = {}
    for k in (1, 2, 3):
        out[f"d{k}"] = _safe_div(
            ((thresh < 1.25**k).astype(jnp.float32) * mask).sum(axis=(1, 2)), num
        )
    sse = (depth_gt - depth_pr) ** 2
    out["rmse"] = jnp.sqrt(_safe_div((sse * mask).sum(axis=(1, 2)), num))
    return out


def _level_masks(valid, num_levels):
    """Concentric centroid-level region masks (``metrics.py:247-273``)."""
    B, H, W = valid.shape
    masks = []
    cumulative = jnp.zeros_like(valid)
    for level in range(1, num_levels + 1):
        offset = (H // num_levels) * (num_levels - level) // 2
        m = jnp.zeros((H, W))
        m = m.at[offset: H - offset, offset: W - offset].set(1.0)
        m = jnp.broadcast_to(m[None], (B, H, W))
        m = jnp.clip(m - cumulative, 0, None) * valid
        cumulative = cumulative + m
        masks.append(m)
    return masks


def evaluate_depth(
    depth_pr,
    depth_gt,
    segmentation_map=None,
    image_average=False,
    scale_invariant=False,
    num_levels=5,
    is_navi=False,
):
    """Global + stuff/things + centroid-level depth metrics
    (``metrics.py:106-321``). Returns ``(global_metrics, metrics_by_level)``
    pytrees of (B,) arrays (or scalars if ``image_average``).

    Per-segment d1-vs-area (``metrics.py:323-355``) is host-side:
    ``segment_metrics_depth``.
    """
    depth_pr, depth_gt = _squeeze_chan(depth_pr), _squeeze_chan(depth_gt)
    if scale_invariant:
        depth_pr = match_scale_and_shift(depth_pr, depth_gt)

    valid = (depth_gt > 0).astype(jnp.float32)
    depth_pr = depth_pr * valid
    num_valid = valid.sum(axis=(1, 2))

    mean_pred = _safe_div((depth_pr * valid).sum(axis=(1, 2)), num_valid)
    var_pred = _safe_div(
        (((depth_pr - mean_pred[:, None, None]) ** 2) * valid).sum(axis=(1, 2)),
        num_valid,
    )
    mean_gt = _safe_div((depth_gt * valid).sum(axis=(1, 2)), num_valid)
    var_gt = _safe_div(
        (((depth_gt - mean_gt[:, None, None]) ** 2) * valid).sum(axis=(1, 2)),
        num_valid,
    )

    g = _threshold_metrics(depth_pr, depth_gt, valid)
    g.update(
        mean_pred=mean_pred,
        std_pred=jnp.sqrt(var_pred),
        variance_pred=var_pred,
        mean_gt=mean_gt,
        std_gt=jnp.sqrt(var_gt),
        variance_gt=var_gt,
        variance_ratio=_safe_div(var_pred, var_gt),
    )

    if not is_navi and segmentation_map is not None:
        stuff_mask = jnp.isin(segmentation_map, jnp.asarray(STUFF)).astype(
            jnp.float32
        ) * valid
        things_mask = jnp.isin(segmentation_map, jnp.asarray(THINGS)).astype(
            jnp.float32
        ) * valid
        sm = _threshold_metrics(depth_pr, depth_gt, stuff_mask)
        tm = _threshold_metrics(depth_pr, depth_gt, things_mask)
        g.update({f"stuff_{k}": v for k, v in sm.items()})
        g.update({f"things_{k}": v for k, v in tm.items()})
        g["stuff_pixels"] = stuff_mask.sum(axis=(1, 2))
        g["things_pixels"] = things_mask.sum(axis=(1, 2))

    by_level = {}
    for i, m in enumerate(_level_masks(valid, num_levels)):
        by_level[f"level_{i + 1}"] = _threshold_metrics(depth_pr, depth_gt, m)

    if image_average:
        g = {k: v.mean() for k, v in g.items()}
        by_level = {
            lk: {k: v.mean() for k, v in lv.items()} for lk, lv in by_level.items()
        }
    return g, by_level


def segment_metrics_depth(depth_pr, depth_gt, segmentation_map,
                          scale_invariant=False):
    """Per-segment d1 vs area (``metrics.py:323-355``); host-side numpy."""
    depth_pr = np.asarray(_squeeze_chan(depth_pr))
    depth_gt = np.asarray(_squeeze_chan(depth_gt))
    if scale_invariant:
        depth_pr = np.asarray(
            match_scale_and_shift(jnp.asarray(depth_pr), jnp.asarray(depth_gt))
        )
    seg = np.asarray(segmentation_map)
    valid = (depth_gt > 0).astype(np.float32)
    pr = depth_pr * valid
    thresh = np.maximum(
        depth_gt / np.clip(pr, 1e-9, None), pr / np.clip(depth_gt, 1e-9, None)
    )
    hit = (thresh < 1.25).astype(np.float32)

    out = []
    for segment_id in np.unique(seg):
        m = (seg == segment_id).astype(np.float32) * valid
        area = m.sum(axis=(1, 2))
        safe = np.where(area == 0, 1e-6, area)
        d1 = (hit * m).sum(axis=(1, 2)) / safe
        for b in range(pr.shape[0]):
            out.append({
                "segment_id": int(segment_id),
                "image_idx": b,
                "area": float(safe[b]),
                "d1_ratio": float(d1[b]),
            })
    return out


def _snorm_err_deg(snorm_pr, snorm_gt):
    pr = snorm_pr[..., :3]
    dot = jnp.sum(pr * snorm_gt, axis=-1)
    norm = jnp.linalg.norm(pr, axis=-1) * jnp.linalg.norm(snorm_gt, axis=-1)
    cos = jnp.clip(dot / jnp.clip(norm, 1e-8, None), -1.0, 1.0)
    return jnp.arccos(cos) * 180.0 / jnp.pi


def _angular_threshold_metrics(err_deg, mask, thresh):
    num = jnp.clip(mask.sum(axis=(1, 2)), 1, None)
    out = {}
    for i, t in enumerate(thresh):
        out[f"d{i + 1}"] = ((err_deg < t).astype(jnp.float32) * mask).sum(
            axis=(1, 2)
        ) / num
    out["rmse"] = jnp.sqrt((err_deg**2 * mask).sum(axis=(1, 2)) / num)
    return out


def evaluate_surface_norm(
    snorm_pr,
    snorm_gt,
    segmentation_map=None,
    image_average=False,
    num_levels=5,
    thresh=(11.25, 22.5, 30.0),
    is_navi=False,
):
    """Angular-error metrics + level + stuff/things splits
    (``metrics.py:397-537``). snorm_* are (B, H, W, 3[+1]); validity is
    non-zero gt normals (``metrics.py:424-426``).

    Note: per-level d-thresholds are computed on the *masked* error map like
    the reference (``err_deg_level = err_deg * mask`` before comparing,
    ``metrics.py:461-471``) for strict parity.
    """
    err_deg = _snorm_err_deg(snorm_pr, snorm_gt)
    valid = (jnp.abs(snorm_gt).sum(axis=-1) > 0).astype(jnp.float32)
    err_deg = err_deg * valid

    g = _angular_threshold_metrics(err_deg, valid, thresh)

    by_level = {}
    for i, m in enumerate(_level_masks(valid, num_levels)):
        # binary m: err_deg*m keeps masked-out pixels at 0, which is what
        # _angular_threshold_metrics expects (same formula, shared code)
        by_level[f"level_{i + 1}"] = _angular_threshold_metrics(
            err_deg * m, m, thresh)

    if not is_navi and segmentation_map is not None:
        stuff_mask = jnp.isin(segmentation_map, jnp.asarray(STUFF)).astype(
            jnp.float32
        ) * valid
        things_mask = jnp.isin(segmentation_map, jnp.asarray(THINGS)).astype(
            jnp.float32
        ) * valid
        for nm, m in (("stuff", stuff_mask), ("things", things_mask)):
            num = jnp.clip(m.sum(axis=(1, 2)), 1, None)
            for j, t in enumerate(thresh):
                g[f"{nm}_d{j + 1}"] = (
                    (err_deg < t).astype(jnp.float32) * m
                ).sum(axis=(1, 2)) / num
            # reference quirk preserved: sqrt(sum)/pixels, not sqrt(mean)
            # (metrics.py:508,520-522)
            g[f"{nm}_rmse"] = jnp.sqrt((err_deg**2 * m).sum(axis=(1, 2))) / num
            g[f"{nm}_pixels"] = num

    if image_average:
        g = {k: v.mean() for k, v in g.items()}
        by_level = {
            lk: {k: v.mean() for k, v in lv.items()} for lk, lv in by_level.items()
        }
    return g, by_level


def evaluate_surface_norm_navi(snorm_pr, snorm_gt, valid, image_average=False):
    """NAVI variant with an explicit valid mask (``metrics.py:361-394``)."""
    err_deg = _snorm_err_deg(snorm_pr, snorm_gt)
    m = valid[..., 0].astype(jnp.float32) if valid.ndim == 4 else valid
    err_deg = err_deg * m
    out = _angular_threshold_metrics(err_deg, m, (11.25, 22.5, 30.0))
    if image_average:
        out = {k: v.mean() for k, v in out.items()}
    return out


def segment_metrics_snorm(snorm_pr, snorm_gt, segmentation_map,
                          thresh0=11.25):
    """Per-segment snorm d1 (``metrics.py:539-562``); host-side numpy."""
    err = np.asarray(_snorm_err_deg(jnp.asarray(snorm_pr), jnp.asarray(snorm_gt)))
    valid = (np.abs(np.asarray(snorm_gt)).sum(axis=-1) > 0).astype(np.float32)
    seg = np.asarray(segmentation_map)
    out = []
    for segment_id in np.unique(seg):
        m = (seg == segment_id).astype(np.float32) * valid
        area = np.clip(m.sum(axis=(1, 2)), 1, None)
        d1 = ((err < thresh0).astype(np.float32) * m).sum(axis=(1, 2)) / area
        for b in range(err.shape[0]):
            out.append({
                "segment_id": int(segment_id),
                "image_idx": b,
                "area": float(area[b]),
                "d1_ratio": float(d1[b]),
            })
    return out


def evaluate_curvature_absrel(norm_curvature, norm_gt_curvature, valid,
                              image_average=False):
    """Taskonomy principal-curvature metrics (``metrics.py:580-678``).
    Inputs NHWC with 2 channels (k1, k2); valid (B, H, W, 1|2)."""
    if valid.shape[-1] == 1:
        valid = jnp.repeat(valid, 2, axis=-1)
    pred = jnp.clip(norm_curvature[..., :2], -1.0, 1.0)
    gt = norm_gt_curvature[..., :2]

    num_valid = [jnp.clip(valid[..., c].sum(axis=(1, 2)), 1, None)
                 for c in range(2)]
    abs_rel_c, d_c = [], []
    for c in range(2):
        ar = jnp.abs(pred[..., c] - gt[..., c]) / jnp.abs(gt[..., c] + 1e-6)
        ar = (ar * valid[..., c]).sum(axis=(1, 2)) / num_valid[c]
        abs_rel_c.append(ar)
        ratio = jnp.maximum(pred[..., c] / gt[..., c], gt[..., c] / pred[..., c])
        ratio = ratio * valid[..., c]
        ds = []
        for k, th in enumerate([1.25, 1.25 * 2, 1.25 * 3]):
            ds.append(((ratio < th).astype(jnp.float32) * valid[..., c]).sum(
                axis=(1, 2)) / num_valid[c])
        d_c.append(ds)

    out = {"AbsRel": (abs_rel_c[0] + abs_rel_c[1]) / 2}
    names = ["δ1.25", "δ2.5", "δ3.75"]
    for k, nm in enumerate(names):
        out[f"{nm}_k1"] = d_c[0][k]
        out[f"{nm}_k2"] = d_c[1][k]
        out[f"{nm}_avg"] = (d_c[0][k] + d_c[1][k]) / 2
    if image_average:
        out = {k: v.mean() for k, v in out.items()}
    return out


def evaluate_reshading_absrel_and_delta(pred, target, mask,
                                        thresholds=(1.1, 1.1**2, 1.1**3),
                                        image_average=False):
    """Taskonomy reshading metrics (``metrics.py:681-739``). NHWC 1-ch."""
    pred = _squeeze_chan(pred)
    target = _squeeze_chan(target)
    mask = _squeeze_chan(mask).astype(jnp.float32)
    pred = pred * mask
    target = target * mask
    num = jnp.clip(mask.sum(axis=(1, 2)), 1, None)
    absrel = jnp.abs(pred - target) / (target + 1e-6)
    out = {"AbsRel": (absrel * mask).sum(axis=(1, 2)) / num}
    for th in thresholds:
        ratio = jnp.maximum(pred / (target + 1e-6), target / (pred + 1e-6))
        out[f"δ_{th}"] = ((ratio < th).astype(jnp.float32) * mask).sum(
            axis=(1, 2)) / num
    if image_average:
        out = {k: v.mean() for k, v in out.items()}
    return out


# --------------------------------------------------------------------------
# binary-mask (objectness) metrics — reference ``evals/utils/metric.py`` and
# the duplicated copies in both objectness drivers
# --------------------------------------------------------------------------
def mask_iou(mask1, mask2):
    """``metric.py:5-9`` (0.5-binarized IoU, image-averaged).

    Deliberate delta (latent-bug policy, README "Deliberate non-ports"):
    an image whose prediction AND target binarize to empty has union 0 —
    the reference computes 0/0 = NaN and poisons the batch mean; here the
    clamp scores it 0 (no overlap found) and keeps the average finite."""
    m1 = mask1 > 0.5
    m2 = mask2 > 0.5
    inter = jnp.sum(m1 & m2, axis=(-1, -2))
    union = jnp.sum(m1 | m2, axis=(-1, -2))
    return jnp.mean(inter / jnp.clip(union, 1, None))


def mask_accuracy(mask1, mask2):
    """``metric.py:12-14``."""
    return jnp.mean(((mask1 > 0.5) == (mask2 > 0.5)).astype(jnp.float32))


def precision_recall(mask_gt, mask):
    """``metric.py:17-29``; empty-denominator → 1.0."""
    gt = mask_gt > 0.5
    pr = mask > 0.5
    tp = jnp.sum(gt & pr, axis=(-1, -2)).astype(jnp.float32)
    mask_area = jnp.sum(pr, axis=(-1, -2)).astype(jnp.float32)
    gt_area = jnp.sum(gt, axis=(-1, -2)).astype(jnp.float32)
    precision = jnp.where(mask_area == 0, 1.0, tp / jnp.clip(mask_area, 1, None))
    recall = jnp.where(gt_area == 0, 1.0, tp / jnp.clip(gt_area, 1, None))
    return precision, recall


def f_score(p, r, betta_sq=0.3):
    """``metric.py:32-35``; NaN → 0."""
    f = ((1 + betta_sq) * p * r) / (betta_sq * p + r)
    return jnp.nan_to_num(f, nan=0.0)


def error_auc(errors, thresholds):
    """Correspondence error AUC (``correspondence.py:199-215``)."""
    errors = [0.0] + sorted(float(e) for e in np.asarray(errors).reshape(-1))
    recall = list(np.linspace(0, 1, len(errors)))
    aucs = []
    for thr in thresholds:
        last_index = int(np.searchsorted(errors, thr))
        y = recall[:last_index] + [recall[max(last_index - 1, 0)]]
        x = errors[:last_index] + [thr]
        aucs.append(float(np.trapezoid(y, x) / thr))
    return aucs


def compute_binned_performance(y, x, x_bins):
    """Mean y per x-bin (``correspondence.py:266-277``)."""
    y = np.asarray(y)
    x = np.asarray(x)
    out = []
    for i in range(len(x_bins) - 1):
        m = (x >= x_bins[i]) & (x < x_bins[i + 1])
        out.append(float(y[m].mean()) if m.any() else float("nan"))
    return out
