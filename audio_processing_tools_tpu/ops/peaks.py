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
    """
    n = x.shape[-1]
    if n < 3:
        return jnp.zeros(x.shape, bool)

    # strict rises/falls
    rise = x[..., 1:] > x[..., :-1]     # rise[i]: x[i+1] > x[i]
    fall = x[..., 1:] < x[..., :-1]     # fall[i]: x[i+1] < x[i]

    # For each position i (1..n-2): it starts a plateau-peak iff
    # x[i] > x[i-1] and the next strictly-different sample is lower.
    # Find, for each i, the next index j > i with x[j] != x[i] — on a plateau
    # all equal.  Vectorize with "next change" scan.
    neq_next = x[..., 1:] != x[..., :-1]          # change between i and i+1
    idx = jnp.arange(n - 1)
    # next_change[i] = min{j >= i : x[j+1] != x[j]}, else n-1
    big = n - 1
    cand = jnp.where(neq_next, idx, big)
    next_change = jax.lax.associative_scan(jnp.minimum, cand[..., ::-1], axis=-1)[..., ::-1]
    # plateau starting at i (with x[i] > x[i-1]) ends at e = next_change[i];
    # peak iff x[e+1] < x[e] (e < n-1 guaranteed if fall exists)
    e = next_change  # (..., n-1) valid for i in 0..n-2
    x_e1 = jnp.take_along_axis(x, jnp.minimum(e + 1, n - 1), axis=-1)
    x_e = jnp.take_along_axis(x, e, axis=-1)
    ends_down = (x_e1 < x_e) & (e < n - 1)

    starts_up = jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,), bool), rise[..., :-1] & ~fall[..., :-1]], axis=-1
    )[..., : n - 1]
    # position i in 1..n-2: left edge of (possible) plateau where x[i] > x[i-1]
    left_edge = jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,), bool), x[..., 1:] > x[..., :-1]], axis=-1
    )  # (..., n): left_edge[i] = x[i] > x[i-1]
    is_peak_start = left_edge[..., : n - 1] & ends_down
    # scipy marks the plateau midpoint (i + e)//2
    mid = (jnp.arange(n - 1) + e) // 2
    out = jnp.zeros(x.shape[:-1] + (n,), bool)
    # scatter: for each plateau-start position that is a peak, set its mid True
    if x.ndim == 1:
        out = out.at[jnp.where(is_peak_start, mid, 0)].max(is_peak_start)
    else:
        flat_flags = is_peak_start.reshape(-1, n - 1)
        flat_mid = jnp.broadcast_to(mid, flat_flags.shape) if mid.ndim == 1 else mid.reshape(-1, n - 1)
        flat_out = out.reshape(-1, n)
        flat_out = jax.vmap(lambda o, f, m: o.at[jnp.where(f, m, 0)].max(f))(
            flat_out, flat_flags, flat_mid
        )
        out = flat_out.reshape(out.shape)
    out = out & jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,), bool), jnp.ones(x.shape[:-1] + (n - 2,), bool),
         jnp.zeros(x.shape[:-1] + (1,), bool)], axis=-1
    )
    return out


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
    x_il = jnp.take_along_axis(x, i_l_c, axis=-1)
    x_il1 = jnp.take_along_axis(x, jnp.minimum(i_l_c + 1, n - 1), axis=-1)
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
    x_ir = jnp.take_along_axis(x, i_r_c, axis=-1)
    x_irm = jnp.take_along_axis(x, jnp.maximum(i_r_c - 1, 0), axis=-1)
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
