"""Host-side image transforms (reference ``evals/datasets/utils.py:81-214``).

The reference composes torchvision + albumentations; neither is assumed
here — the same operations are implemented with numpy/cv2 (nearest
interpolation like the reference's ``interpolation=0`` choices, which it
uses so depth/normal targets stay valid).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def mean_std(image_mean: str):
    if image_mean == "clip":
        return CLIP_MEAN, CLIP_STD
    if image_mean == "imagenet":
        return IMAGENET_MEAN, IMAGENET_STD
    if image_mean in ("None", "none", None):
        return (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)
    if image_mean == "half":  # ScanNet pairs use mean 0.5 (scannet_pairs.py)
        return (0.5, 0.5, 0.5), (1.0, 1.0, 1.0)
    raise ValueError(image_mean)


def normalize_image(img: np.ndarray, image_mean: str = "imagenet") -> np.ndarray:
    """uint8/float (H, W, 3) → normalized float32."""
    mean, std = mean_std(image_mean)
    # dtype decides the /255, not a value heuristic: a near-black uint8
    # frame (max <= 1) is still 0..255-scaled. Floats keep the heuristic
    # for callers that pass un-rescaled float arrays.
    is_int = np.issubdtype(np.asarray(img).dtype, np.integer)
    img = np.asarray(img).astype(np.float32)
    if is_int or img.max() > 1.5:
        img = img / 255.0
    return (img - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def color_jitter(img: np.ndarray, rng: np.random.RandomState,
                 brightness=0.2, contrast=0.2, saturation=0.2, hue=0.2,
                 p=0.8) -> np.ndarray:
    """torchvision-style ColorJitter on a float [0,1] (H, W, 3) image."""
    if rng.rand() > p:
        return img
    img = img.copy()
    b = 1 + rng.uniform(-brightness, brightness)
    img *= b
    c = 1 + rng.uniform(-contrast, contrast)
    gray = img.mean()
    img = (img - gray) * c + gray
    s = 1 + rng.uniform(-saturation, saturation)
    lum = img.mean(axis=-1, keepdims=True)
    img = (img - lum) * s + lum
    if hue:
        # torchvision adjust_hue: shift the HSV hue channel (in turns);
        # the reference trains with ColorJitter(0.2, 0.2, 0.2, 0.2) whose
        # 4th argument is hue — dropping it silently narrowed the train
        # augmentation distribution
        from matplotlib.colors import hsv_to_rgb, rgb_to_hsv

        dh = rng.uniform(-hue, hue)
        hsv = rgb_to_hsv(np.clip(img, 0.0, 1.0))
        hsv[..., 0] = (hsv[..., 0] + dh) % 1.0
        img = hsv_to_rgb(hsv)
    return np.clip(img, 0.0, 1.0)


def hflip(*arrays: np.ndarray):
    """Horizontal flip of (H, W, C) targets (albumentations
    ``HorizontalFlip`` semantics: pure spatial flip, no channel sign
    handling — matching the reference's use on normals)."""
    return tuple(np.ascontiguousarray(a[:, ::-1]) for a in arrays)


def rotate(arrays, angle_deg: float):
    """Rotate (H, W, C) targets by ``angle_deg`` with nearest interpolation
    and zero border (albumentations ``Rotate(interpolation=0)``)."""
    if cv2 is None:
        return tuple(arrays)
    out = []
    for a in arrays:
        h, w = a.shape[:2]
        M = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle_deg, 1.0)
        r = cv2.warpAffine(a, M, (w, h), flags=cv2.INTER_NEAREST,
                           borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        if r.ndim == 2 and a.ndim == 3:
            r = r[..., None]
        out.append(r)
    return tuple(out)


def random_resized_crop(arrays, rng: np.random.RandomState, out_hw,
                        scale=(0.5, 1.0), ratio=(1.0, 1.0)):
    """albumentations RandomResizedCrop with nearest interp."""
    h, w = arrays[0].shape[:2]
    area = h * w
    for _ in range(10):  # albumentations resamples infeasible draws
        s = rng.uniform(*scale)
        r = rng.uniform(*ratio)
        ch = int(round(np.sqrt(area * s / r)))
        cw = int(round(np.sqrt(area * s * r)))
        if ch <= h and cw <= w:
            break
    else:
        # fallback preserves the requested RATIO instead of clamping each
        # side independently (which distorted e.g. ratio=(1,1) square
        # crops into 480x554 on non-square NYU frames)
        cw = min(w, int(round(h * r)))
        ch = min(h, int(round(cw / r)))
    y0 = rng.randint(0, h - ch + 1)
    x0 = rng.randint(0, w - cw + 1)
    out = []
    for a in arrays:
        crop = a[y0: y0 + ch, x0: x0 + cw]
        out.append(resize_nearest(crop, out_hw))
    return tuple(out)


def resize_nearest(a: np.ndarray, out_hw) -> np.ndarray:
    oh, ow = out_hw
    h, w = a.shape[:2]
    if (h, w) == (oh, ow):
        return a
    ys = (np.arange(oh) * h // oh).clip(0, h - 1)
    xs = (np.arange(ow) * w // ow).clip(0, w - 1)
    return a[ys][:, xs]


def nyu_shared_augment(image, depth, snorm, rng: np.random.RandomState,
                       out_hw, rotateflip: bool = True):
    """The reference's NYU shared augmentation pipeline
    (``utils.py:200-214``): HFlip(p) → Rotate(±10, p) → RandomResizedCrop
    (scale 0.5-1, ratio 1, p=0.5), all nearest."""
    p_rotflip = 0.5 if rotateflip else 0.0
    if rng.rand() < p_rotflip:
        image, depth, snorm = hflip(image, depth, snorm)
    if rng.rand() < p_rotflip:
        angle = rng.uniform(-10, 10)
        image, depth, snorm = rotate((image, depth, snorm), angle)
    if rng.rand() < 0.5:
        image, depth, snorm = random_resized_crop(
            (image, depth, snorm), rng, out_hw
        )
    else:
        image = resize_nearest(image, out_hw)
        depth = resize_nearest(depth, out_hw)
        snorm = resize_nearest(snorm, out_hw)
    return image, depth, snorm
