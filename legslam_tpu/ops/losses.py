"""Loss library: L1, PSNR (two variants), SSIM, language-feature cosine.

Behavioral parity with include/loss_utils.h:
  - l1_loss:                    loss_utils.h:27
  - psnr (10*log10(1/mse)):     loss_utils.h:31
  - psnr_gaussian_splatting:    loss_utils.h:46 (per-channel mse, 20*log10)
  - cosine_similarity over the 64-D channel axis per pixel, MEAN over pixels
    (loss_utils.h:36-40). NOTE the sign quirk: the training loss ADDS the
    mean cosine similarity (gaussian_mapper.cpp:716-721), anti-aligning
    rendered LF with the encoder LF; eval consistently inverts similarity.
    We replicate the convention end-to-end (SURVEY.md §3.3).
  - ssim: 11x11 Gaussian window sigma=1.5, per-channel grouped conv,
    constant zero padding (torch conv2d padding), C1=0.01^2, C2=0.03^2
    (loss_utils.h:52-131).

All images here are channel-last [H, W, C] float32 in [0,1].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from legslam_tpu.config import SSIM_C1, SSIM_C2, SSIM_SIGMA, SSIM_WINDOW


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - gt))


def masked_l1_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                   mask: jnp.ndarray) -> jnp.ndarray:
    """L1 with the RENDERED side masked, against the unmasked GT. The
    reference multiplies only the rendered image by the undistortion mask
    before a plain mean (gaussian_mapper.cpp:711-721:
    l1_loss(masked_image, gt_image)), so masked-out pixels still contribute
    |0 - gt| and the denominator counts them — we replicate that."""
    return jnp.mean(jnp.abs(pred * mask - gt))


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((img1 - img2) ** 2)
    return 10.0 * jnp.log10(1.0 / mse)


def psnr_gaussian_splatting(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-channel MSE then 20*log10(1/sqrt(mse)), averaged (loss_utils.h:46).
    Channel-last input; the reference views [C, -1]."""
    mse = jnp.mean((img1 - img2) ** 2, axis=(0, 1))
    return jnp.mean(20.0 * jnp.log10(1.0 / jnp.sqrt(mse)))


def lf_cosine_similarity(pred: jnp.ndarray, gt: jnp.ndarray,
                         eps: float = 1e-8) -> jnp.ndarray:
    """Mean over pixels of per-pixel cosine similarity along the channel
    axis (loss_utils.h:36-40; torch cosine_similarity eps=1e-8 semantics:
    denominator clamped at eps per vector)."""
    return _lf_cos_masked(pred, gt, None, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _lf_cos_masked(pred: jnp.ndarray, gt: jnp.ndarray,
                   mask: jnp.ndarray | None, eps: float) -> jnp.ndarray:
    """cosine(mask*pred, gt) with the rendered-side mask FOLDED into the
    channel reductions (the reference masks only the render,
    gaussian_mapper.cpp:711-721).

    Custom VJP: pred/gt are [H, W, 64] (~52 MB each at full res) and the
    64-channel axis sits in the lane dimension, so the op is pure HBM
    bandwidth. The forward fuses the three channel reductions into one
    read of each input and keeps only [H, W] scalar planes as residuals;
    the backward is ONE more read of each input producing dpred — autodiff
    instead re-materialized the products and re-read both inputs through
    several unfused passes (a measured multi-ms slice of the loss
    segment). Folding the mask in means the masked [H, W, 64] render is
    never materialized (its write + two reads were the largest remaining
    loss-segment traffic) — the mask enters the scalar planes as
    dot *= m, nsq1 *= m^2, and the backward chain-rules through it.
    Gradients match autodiff analytically, including the clamp: where
    |m*pred|^2 <= eps^2 the max() kills the norm branch, leaving only the
    gt/(n1*n2) term. The mask itself gets ZERO gradient (it is camera
    data, never optimized)."""
    dot, n1, n2, _, _ = _lf_cos_stats(pred, gt, mask, eps)
    return jnp.mean(dot / (n1 * n2))


def _lf_cos_stats(pred, gt, mask, eps):
    dot = jnp.sum(pred * gt, axis=-1)
    nsq1 = jnp.sum(pred * pred, axis=-1)
    if mask is not None:
        dot = dot * mask
        nsq1 = nsq1 * (mask * mask)
    nsq2 = jnp.sum(gt * gt, axis=-1)
    # sqrt(max(., eps^2)) keeps the gradient finite at the zero vector
    # (rendered LF is exactly zero at init); torch clamps the denominator.
    n1 = jnp.sqrt(jnp.maximum(nsq1, eps * eps))
    n2 = jnp.sqrt(jnp.maximum(nsq2, eps * eps))
    return dot, n1, n2, nsq1, nsq2


def _lf_cos_fwd(pred, gt, mask, eps):
    dot, n1, n2, nsq1, nsq2 = _lf_cos_stats(pred, gt, mask, eps)
    val = jnp.mean(dot / (n1 * n2))
    return val, (pred, gt, mask, dot, n1, n2, nsq1, nsq2)


def _lf_cos_bwd(eps, res, g):
    pred, gt, mask, dot, n1, n2, nsq1, nsq2 = res
    npix = dot.size
    inv = 1.0 / (n1 * n2)
    # with p = m*pred: d(dot/(n1 n2))/dpred = m*gt/(n1 n2) -
    # m^2*dot/(n1^3 n2) * pred; the norm branch is clamped off where max()
    # selected eps^2 (symmetric for dgt; XLA dead-code-eliminates
    # whichever side the caller discards)
    wp = jnp.where(nsq1 > eps * eps, dot * inv / (n1 * n1), 0.0)
    wg = jnp.where(nsq2 > eps * eps, dot * inv / (n2 * n2), 0.0)
    scale = g / npix
    minv, m2wp = inv, wp
    if mask is not None:
        minv = mask * inv
        m2wp = (mask * mask) * wp
    dpred = (gt * minv[..., None] - pred * m2wp[..., None]) * scale
    # dgt uses the masked pred ONLY in the cross term: d/dgt = m*pred*inv
    # - gt*wg (wg already carries the mask through dot)
    dgt = (pred * minv[..., None] - gt * wg[..., None]) * scale
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dpred, dgt, dmask


_lf_cos_masked.defvjp(_lf_cos_fwd, _lf_cos_bwd)


@functools.lru_cache(maxsize=4)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2.0 * sigma * sigma))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _band_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """[n, n] banded blur operator: (M @ x)[i] = sum_k win[k] x[i+k-half],
    rows truncated at the borders (== zero padding)."""
    win = _gaussian_window(window_size, sigma)
    half = window_size // 2
    m = np.zeros((n, n), np.float32)
    for k in range(window_size):
        d = k - half
        idx = np.arange(max(0, -d), min(n, n - d))
        m[idx, idx + d] = win[k]
    return m


def _blur(img: jnp.ndarray, window_size: int = SSIM_WINDOW,
          sigma: float = SSIM_SIGMA) -> jnp.ndarray:
    """Separable 11x11 blur with zero padding, per channel ([H, W, C]).

    TPU-first formulation: 1-D convolutions over a C=3-channel image map
    terribly onto the MXU (the channel axis lands in the 128-wide lane
    dimension), so each pass is instead a dense banded matmul over the
    blurred axis — [H,H] @ [H, W*C] then [W,W] @ [W, H*C] — which XLA tiles
    at full MXU utilization (~GMAC-scale, sub-ms; the conv form measured
    tens of ms per train step on v5e). Precision HIGH (bf16x3 on TPU,
    ~1e-7 relative — exact f32 on CPU) at half the MXU passes of HIGHEST;
    the SSIM statistics sit far above that noise floor."""
    h, w, c = img.shape
    mh = jnp.asarray(_band_matrix(h, window_size, sigma))
    mw = jnp.asarray(_band_matrix(w, window_size, sigma))
    x = jnp.dot(mh, img.reshape(h, w * c),
                precision=jax.lax.Precision.HIGH).reshape(h, w, c)
    y = jnp.dot(mw, x.transpose(1, 0, 2).reshape(w, h * c),
                precision=jax.lax.Precision.HIGH).reshape(w, h, c)
    return y.transpose(1, 0, 2)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = SSIM_WINDOW, sigma: float = SSIM_SIGMA
         ) -> jnp.ndarray:
    """Mean SSIM map, matching loss_utils.h:76-116 (zero-padded conv).

    All five blurred statistics ride ONE banded-matmul pair by stacking
    along the channel axis (5x wider RHS beats 5 separate dispatches and
    amortizes reading the band matrices)."""
    c = img1.shape[-1]
    stack = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1)
    b = _blur(stack, window_size, sigma)
    mu1, mu2 = b[..., :c], b[..., c:2 * c]
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = b[..., 2 * c:3 * c] - mu1_sq
    sigma2_sq = b[..., 3 * c:4 * c] - mu2_sq
    sigma12 = b[..., 4 * c:] - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + SSIM_C1) * (2 * sigma12 + SSIM_C2)) / \
               ((mu1_sq + mu2_sq + SSIM_C1) * (sigma1_sq + sigma2_sq + SSIM_C2))
    return jnp.mean(ssim_map)


def mapping_loss(render_color: jnp.ndarray, gt_color: jnp.ndarray,
                 render_lf: jnp.ndarray | None, gt_lf: jnp.ndarray | None,
                 render_depth: jnp.ndarray, gt_depth: jnp.ndarray,
                 mask: jnp.ndarray, lambda_dssim: float) -> jnp.ndarray:
    """The full training loss (gaussian_mapper.cpp:711-721):

      (1-λ)*L1(img) + λ*(1-SSIM(img)) + mean_cos(LF) + L1(depth)

    The undistortion mask multiplies ONLY the rendered tensors; GT stays
    unmasked — matching the reference, which compares masked renders to raw
    GT (gaussian_mapper.cpp:711-721). The +cos(LF) sign is intentional —
    see module docstring.
    """
    m = mask[..., None] if mask.ndim == 2 else mask
    pc = render_color * m
    loss = (1.0 - lambda_dssim) * l1_loss(pc, gt_color) + \
        lambda_dssim * (1.0 - ssim(pc, gt_color))
    if render_lf is not None and gt_lf is not None:
        # mask folded into the cosine's channel reductions: the masked
        # [H, W, 64] render is never materialized (see _lf_cos_masked)
        loss = loss + _lf_cos_masked(render_lf, gt_lf, m[..., 0], 1e-8)
    md = mask if mask.ndim == 2 else mask[..., 0]
    loss = loss + l1_loss(render_depth * md, gt_depth)
    return loss
