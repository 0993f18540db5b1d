"""Vectorized peak detection (scipy ``find_peaks`` family, device-friendly).

scipy's peak utilities are pointer-walking C loops over dynamic-length
outputs; on TPU we need static shapes.  The re-design returns fixed-size
boolean masks / per-position arrays:

  * :func:`local_maxima` — strict local maxima incl. scipy's plateau rule.
  * :func:`peak_prominences` — prominence of every position treated as a peak
    (O(N^2) masked reductions; windows here are <= a few hundred bins).
  * :func:`peak_widths_rel` — width at ``peak - rel_height * prominence``
    with linear interpolation (scipy ``peak_widths`` parity).
  * :func:`select_peaks_by_distance` — scipy's priority-based distance
    filtering (highest peak wins), as a bounded ``fori_loop``.

Used by the classifier peak-structure gate
(``edge/rain_frame_classifier.py:761-843``), the stage-2 confirmer
(``edge/time_domain_detector.py:210-214``), and the RoE novelty masking
(``edge/dsp_rain_detection.py:1935-1937``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def local_maxima(x: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of local maxima along the last axis.

    Matches ``scipy.signal._local_maxima_1d``: for plateaus, the midpoint
    sample is marked.  Interior points only (first/last never peaks).

    Gather/scatter-free formulation (TPU serializes both — the old
    take-along + ``.at[].max`` scatter version measured 28 ms/step on the
    RoE geometry, ~60% of that engine's device time): every position m
    recovers its plateau ``[s, e]`` from two "nearest strict change"
    associative scans whose encodings carry the change's direction, then
    is marked elementwise iff the entering change was a rise, the leaving
    change is a fall, and ``m == (s + e) // 2``.
    """
    n = x.shape[-1]
    if n < 3:
        return jnp.zeros(x.shape, bool)

    # boundary j sits between samples j and j+1 (j = 0..n-2)
    chg = x[..., 1:] != x[..., :-1]
    up = x[..., 1:] > x[..., :-1]
    fall = x[..., 1:] < x[..., :-1]
    idx = jnp.arange(n - 1)

    # last change boundary j <= m-1 (the change entering m's plateau),
    # encoded as j*2 + up so one running max carries its direction
    enc_l = jnp.where(chg, idx * 2 + up.astype(jnp.int32), -1)
    cmax = jax.lax.cummax(enc_l, axis=enc_l.ndim - 1)
    neg1 = jnp.full(x.shape[:-1] + (1,), -1, cmax.dtype)
    pos_enc = jnp.concatenate([neg1, cmax], axis=-1)  # (..., n): max over j<m
    has_l = pos_enc >= 0
    s = jnp.where(has_l, (pos_enc >> 1) + 1, 0)       # plateau start
    left_rise = has_l & ((pos_enc & 1) == 1)

    # next change boundary j >= m (the change leaving m's plateau), encoded
    # with reversed index so the running max picks the SMALLEST j
    enc_r = jnp.where(chg, (n - 2 - idx) * 2 + fall.astype(jnp.int32), -1)
    rmax = jax.lax.cummax(enc_r, axis=enc_r.ndim - 1, reverse=True)
    nxt_enc = jnp.concatenate([rmax, neg1], axis=-1)  # (..., n): max over j>=m
    has_r = nxt_enc >= 0
    e = jnp.where(has_r, (n - 2) - (nxt_enc >> 1), n - 1)  # plateau end
    right_fall = has_r & ((nxt_enc & 1) == 1)

    m = jnp.arange(n)
    return left_rise & right_fall & (m == (s + e) // 2)


def peak_prominences(x: jnp.ndarray, is_peak: jnp.ndarray) -> jnp.ndarray:
    """Prominence for every position (valid where ``is_peak``); last axis.

    scipy semantics: extend left/right from the peak until a strictly higher
    sample or the border; base = min of each stretch; prominence = peak -
    max(left_base, right_base).  O(N^2) masked-matrix form.
    """
    n = x.shape[-1]
    i = jnp.arange(n)
    xi = x[..., :, None]       # peak position p -> row
    xj = x[..., None, :]       # scan position j -> col
    jj = i[None, :]
    pp = i[:, None]

    higher = xj > xi  # (.., p, j)
    neg = jnp.asarray(-jnp.inf, x.dtype)

    # L(p) = max{j < p : x[j] > x[p]}, else -1
    left_block = jnp.where(higher & (jj < pp), jj, -1)
    L = jnp.max(left_block, axis=-1)  # (..., p)
    # left base = min over (L, p]
    in_left = (jj > L[..., :, None]) & (jj <= pp)
    left_base = jnp.min(jnp.where(in_left, xj, -neg), axis=-1)

    # R(p) = min{j > p : x[j] > x[p]}, else n
    right_block = jnp.where(higher & (jj > pp), jj, n)
    R = jnp.min(right_block, axis=-1)
    in_right = (jj >= pp) & (jj < R[..., :, None])
    right_base = jnp.min(jnp.where(in_right, xj, -neg), axis=-1)

    prom = x - jnp.maximum(left_base, right_base)
    return jnp.where(is_peak, prom, 0.0)


def peak_widths_rel(x: jnp.ndarray, is_peak: jnp.ndarray,
                    prominences: jnp.ndarray, rel_height: float = 0.5
                    ) -> jnp.ndarray:
    """Width of each peak at ``height = x[p] - rel_height * prominence``.

    scipy ``peak_widths`` parity: walk left/right while above the height,
    linear interpolation at the crossings.  Returns width per position
    (0 where not a peak).
    """
    n = x.shape[-1]
    j = jnp.arange(n)
    pp = j[:, None]
    jj = j[None, :]
    h = x - rel_height * prominences  # (..., n) height per peak position
    xj = x[..., None, :]
    hb = h[..., :, None]

    # left: i_left = max{j < p : x[j] <= h}, crossing between i_left and i_left+1
    le = (jj < pp) & (xj <= hb)
    has_l = jnp.any(le, axis=-1)
    i_l = jnp.max(jnp.where(le, jj, -1), axis=-1)
    i_l_c = jnp.maximum(i_l, 0)
    # one-hot picks instead of take_along_axis (serial gather loop on TPU);
    # the (..., n, n) comparison planes already exist in this function
    x_il = jnp.sum(jnp.where(jj == i_l_c[..., :, None], xj, 0.0), axis=-1)
    x_il1 = jnp.sum(
        jnp.where(jj == jnp.minimum(i_l_c + 1, n - 1)[..., :, None], xj, 0.0),
        axis=-1,
    )
    interp_l = jnp.where(
        has_l & (x_il < h),
        (h - x_il) / jnp.where(x_il1 != x_il, x_il1 - x_il, 1.0),
        0.0,
    )
    left_ip = jnp.where(has_l, i_l_c.astype(x.dtype) + interp_l, 0.0)

    # right
    re = (jj > pp) & (xj <= hb)
    has_r = jnp.any(re, axis=-1)
    i_r = jnp.min(jnp.where(re, jj, n), axis=-1)
    i_r_c = jnp.minimum(i_r, n - 1)
    x_ir = jnp.sum(jnp.where(jj == i_r_c[..., :, None], xj, 0.0), axis=-1)
    x_irm = jnp.sum(
        jnp.where(jj == jnp.maximum(i_r_c - 1, 0)[..., :, None], xj, 0.0),
        axis=-1,
    )
    interp_r = jnp.where(
        has_r & (x_ir < h),
        (h - x_ir) / jnp.where(x_irm != x_ir, x_irm - x_ir, 1.0),
        0.0,
    )
    right_ip = jnp.where(has_r, i_r_c.astype(x.dtype) - interp_r,
                         jnp.asarray(n - 1, x.dtype))

    width = right_ip - left_ip
    return jnp.where(is_peak, width, 0.0)


def find_peaks(x: jnp.ndarray, height: jnp.ndarray | float | None = None,
               prominence: float | None = None):
    """Masked ``find_peaks``: returns ``(is_peak, prominences)``.

    ``height``/``prominence`` filter like scipy's scalar lower bounds.
    Prominences are computed only when needed (or requested by passing 0.0).
    """
    mask = local_maxima(x)
    prom = None
    if prominence is not None:
        prom = peak_prominences(x, mask)
        mask = mask & (prom >= prominence)
    if height is not None:
        mask = mask & (x >= height)
    if prom is None:
        prom = peak_prominences(x, mask)
    return mask, jnp.where(mask, prom, 0.0)


def select_peaks_by_distance(x: jnp.ndarray, is_peak: jnp.ndarray,
                             distance: int, max_peaks: int = 64) -> jnp.ndarray:
    """scipy distance filtering: highest peaks claim a +-distance window.

    Bounded greedy loop over the ``max_peaks`` tallest candidates (1-D only).
    """
    n = x.shape[-1]
    neg = jnp.asarray(-jnp.inf, x.dtype)
    vals = jnp.where(is_peak, x, neg)
    # scipy priority: tallest first; ties -> larger index first
    order = jnp.lexsort((-jnp.arange(n), -vals))
    keep = is_peak

    def body(k, keep):
        p = order[k]
        valid = is_peak[p] & keep[p]
        idx = jnp.arange(n)
        # scipy removes peaks strictly closer than `distance`
        kill = (idx > p - distance) & (idx < p + distance) & (idx != p)
        keep = jnp.where(valid, keep & ~kill, keep)
        return keep

    keep = jax.lax.fori_loop(0, min(max_peaks, n), body, keep)
    return keep & is_peak
