"""Bilinear grid sampling as gather + interpolation weights.

TPU-native replacement for ``torch.nn.functional.grid_sample`` (used by the
reference for all backward warps: tf_nerf.py:366-367, training.py:312).
TPUs have no texture units; the sample is expressed as four flat gathers
(`jnp.take` over H*W) plus VPU blends, which XLA fuses into one program.

Semantics match torch with ``align_corners=False`` exactly for both
``zeros`` and ``border`` padding modes (validated against torch CPU in
tests/test_grid_sample.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                padding_mode: str = "zeros") -> jnp.ndarray:
    """Sample ``img`` at normalized ``grid`` locations, bilinear.

    Args:
      img:  [B, H, W, C]   (NHWC — TPU-native layout).
      grid: [B, Hg, Wg, 2] with (x, y) in [-1, 1], torch convention.
      padding_mode: 'zeros' | 'border'.

    Returns:
      [B, Hg, Wg, C]
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")
    B, H, W, C = img.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    # unnormalize, align_corners=False: pixel centers at 0.5 offsets
    ix = ((gx + 1.0) * W - 1.0) * 0.5
    iy = ((gy + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    img_flat = img.reshape(B, H * W, C)

    def gather(yi, xi):
        if padding_mode == "zeros":
            valid = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
            xc = jnp.clip(xi, 0, W - 1)
            yc = jnp.clip(yi, 0, H - 1)
            idx = (yc * W + xc).reshape(B, -1)
            vals = jnp.take_along_axis(img_flat, idx[..., None], axis=1)
            vals = vals.reshape(*yi.shape, C)
            return vals * valid[..., None].astype(img.dtype)
        else:  # border
            xc = jnp.clip(xi, 0, W - 1)
            yc = jnp.clip(yi, 0, H - 1)
            idx = (yc * W + xc).reshape(B, -1)
            vals = jnp.take_along_axis(img_flat, idx[..., None], axis=1)
            return vals.reshape(*yi.shape, C)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def grid_sample_np(img, grid):
    """Numpy mirror of ``grid_sample`` (zeros padding), op-for-op.

    Used by the data loader to precompute blackaug's static warps on the
    host (the canonical face and its mask are dataset constants — warping
    them per frame inside the train step cost two full-frame 500² gathers,
    ~70% of the step time on TPU).  The formula and operation ORDER match
    the jax version exactly, so fp32 results are bit-identical and the
    precomputed path preserves parity (pinned in tests).

    img: [B, H, W, C] float32; grid: [B, Hg, Wg, 2].  Returns [B, Hg, Wg, C].
    """
    import numpy as np
    B, H, W, C = img.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    ix = ((gx + 1.0) * np.float32(W) - 1.0) * np.float32(0.5)
    iy = ((gy + 1.0) * np.float32(H) - 1.0) * np.float32(0.5)
    x0 = np.floor(ix)
    y0 = np.floor(iy)
    wx = (ix - x0)[..., None].astype(img.dtype)
    wy = (iy - y0)[..., None].astype(img.dtype)
    x0i = x0.astype(np.int32)
    y0i = y0.astype(np.int32)
    img_flat = img.reshape(B, H * W, C)
    bidx = np.arange(B)[:, None]

    def gather(yi, xi):
        valid = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
        xc = np.clip(xi, 0, W - 1)
        yc = np.clip(yi, 0, H - 1)
        idx = (yc * W + xc).reshape(B, -1)
        vals = img_flat[bidx, idx].reshape(*yi.shape, C)
        return vals * valid[..., None].astype(img.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def grid_sample_onehot(src: jnp.ndarray, grid: jnp.ndarray,
                       y_off: int, x_off: int, height: int,
                       width: int) -> jnp.ndarray:
    """Bilinear sampling of a SMALL source crop as two one-hot contractions.

    TPUs execute per-element gathers at ~32 ns/sample; when the source fits
    on-chip, the gather can instead be a [P, Hs] × [Hs, Ws·C] MXU matmul
    (row selection+interp) followed by a VPU column blend — orders of
    magnitude more parallel.  Used by the windowed post-fusion composite
    where the source is the expanded-lip crop (~170² px).

    Args:
      src: [B, Hs, Ws, C] source crop = image[y_off:y_off+Hs, x_off:x_off+Ws].
      grid: [B, P, 2] (x, y) in [-1, 1] normalized to the FULL image of size
        (height, width), torch align_corners=False convention.
    Returns:
      [B, P, C], equal to grid_sample(full_image, grid) wherever all four
      bilinear neighbors fall inside the crop (callers guarantee this for
      the pixels they consume; other outputs are clamped-edge junk).
    """
    b, hs, ws, c = src.shape
    ix = ((grid[..., 0] + 1.0) * width - 1.0) * 0.5 - x_off
    iy = ((grid[..., 1] + 1.0) * height - 1.0) * 0.5 - y_off
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = (ix - x0)[..., None]
    wy = (iy - y0)[..., None]
    x0 = jnp.clip(x0.astype(jnp.int32), 0, ws - 2)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, hs - 2)

    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, hs), 2)
    onehot_y = ((rows == y0[..., None]).astype(src.dtype) * (1.0 - wy)
                + (rows == y0[..., None] + 1).astype(src.dtype) * wy)
    # row gather+interp on the MXU: [B, P, Hs] @ [B, Hs, Ws*C].  The [B, P,
    # Ws·C] intermediate dominates the op's HBM traffic — accumulate it in
    # the source dtype (each element mixes only two rows, so a bf16
    # intermediate costs <=0.4% of pixel range on an already-bf16 pipeline)
    acc = jnp.float32 if src.dtype == jnp.float32 else src.dtype
    g = jnp.einsum("bph,bhk->bpk", onehot_y,
                   src.reshape(b, hs, ws * c),
                   preferred_element_type=acc)
    g = g.reshape(b, -1, ws, c)

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ws), 2)
    onehot_x = ((cols == x0[..., None]).astype(g.dtype) * (1.0 - wx)
                + (cols == x0[..., None] + 1).astype(g.dtype) * wx)
    return jnp.einsum("bpw,bpwc->bpc", onehot_x, g).astype(src.dtype)


def grid_sample_onehot_border(src: jnp.ndarray,
                              grid: jnp.ndarray) -> jnp.ndarray:
    """Full-source bilinear sampling with EXACT ``border`` padding as two
    one-hot MXU contractions.

    Equals ``grid_sample(src, grid, 'border')`` for EVERY grid value:
    torch's border mode clamps each bilinear neighbor's index into the
    image, which is equivalent to clamping the continuous coordinate to
    [0, size-1] first and then flooring into [0, size-2] with the residual
    weight (out-of-range rows collapse onto the edge row with weight 1).
    That closed form needs no per-neighbor masking, so the row gather
    becomes a [P, H] × [H, W·C] matmul on the MXU instead of 4·P
    serialized ~32 ns gathers — the same trick as ``grid_sample_onehot``
    but exact over the whole plane, not just a crop interior.  Used by the
    canonical-depth photometric loss (train_step.py), whose warp grid
    depends on the LEARNED depth and therefore cannot be precomputed on
    the host like the blackaug warps.

    Args:
      src: [B, H, W, C]; grid: [B, P, 2] (x, y) in [-1, 1] normalized to
        (H, W), torch align_corners=False convention.
    Returns:
      [B, P, C].
    """
    b, h, w, c = src.shape
    ix = jnp.clip(((grid[..., 0] + 1.0) * w - 1.0) * 0.5, 0.0, w - 1.0)
    iy = jnp.clip(((grid[..., 1] + 1.0) * h - 1.0) * 0.5, 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(ix).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(iy).astype(jnp.int32), 0, h - 2)
    wx = (ix - x0.astype(ix.dtype))[..., None]
    wy = (iy - y0.astype(iy.dtype))[..., None]

    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, h), 2)
    onehot_y = ((rows == y0[..., None]).astype(src.dtype) * (1.0 - wy)
                + (rows == y0[..., None] + 1).astype(src.dtype) * wy)
    # accumulate in fp32 (each output mixes only two rows; see
    # grid_sample_onehot for the bf16 intermediate-error budget)
    acc = jnp.float32 if src.dtype == jnp.float32 else src.dtype
    g = jnp.einsum("bph,bhk->bpk", onehot_y, src.reshape(b, h, w * c),
                   preferred_element_type=acc)
    g = g.reshape(b, -1, w, c)

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    onehot_x = ((cols == x0[..., None]).astype(g.dtype) * (1.0 - wx)
                + (cols == x0[..., None] + 1).astype(g.dtype) * wx)
    return jnp.einsum("bpw,bpwc->bpc", onehot_x, g).astype(src.dtype)


def warp_box_mask(grid: jnp.ndarray, box, height: int, width: int,
                  binarize: bool = True) -> jnp.ndarray:
    """Bilinear sample of an axis-aligned rectangle indicator — in closed
    form, gather-free.

    Equivalent to ``grid_sample(box_image, grid, 'zeros')`` where box_image
    is 1 on rows [y0, y1) × cols [x0, x1) (clipped to the image) and 0
    elsewhere, exploiting that a separable indicator bilinearly interpolates
    as a product of per-axis coverages.  This removes the dominant gather in
    the post-fusion compositing path (reference tf_nerf.py:361-369 samples a
    literal mask image).

    Args:
      grid: [..., 2] (x, y) in [-1, 1], torch convention.
      box: (x0, x1, y0, y1) half-open pixel bounds of the rectangle.
    Returns:
      [..., 1]: binarized (≠0 → 1) coverage if ``binarize``, else the exact
      bilinear value.
    """
    x0b, x1b, y0b, y1b = box
    x_lo, x_hi = max(int(x0b), 0), min(int(x1b), width) - 1
    y_lo, y_hi = max(int(y0b), 0), min(int(y1b), height) - 1

    ix = ((grid[..., 0] + 1.0) * width - 1.0) * 0.5
    iy = ((grid[..., 1] + 1.0) * height - 1.0) * 0.5
    fx = jnp.floor(ix)
    fy = jnp.floor(iy)
    wx = ix - fx
    wy = iy - fy

    def cov(f, w, lo, hi):
        in0 = ((f >= lo) & (f <= hi)).astype(grid.dtype)
        in1 = ((f + 1 >= lo) & (f + 1 <= hi)).astype(grid.dtype)
        return in0 * (1.0 - w) + in1 * w

    val = cov(fx, wx, x_lo, x_hi) * cov(fy, wy, y_lo, y_hi)
    if binarize:
        val = (val != 0).astype(grid.dtype)
    return val[..., None]
