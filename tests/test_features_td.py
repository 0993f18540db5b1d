"""Parity tests for vectorized TD features vs a scipy loop oracle."""

import numpy as np
import jax.numpy as jnp
import scipy.signal as spsig
import scipy.stats

from audio_processing_tools_tpu.ops.features_td import (
    extract_td_features,
    block_energy_peak_features,
    subframe_energy,
)

FS = 11162
FRAME, HOP = 256, 128


def _signal(rng, n=FS * 2):
    x = 0.02 * rng.standard_normal(n)
    # three raindrop-like pings
    for t0 in (3000, 9000, 15000):
        ping = 0.6 * np.exp(-np.arange(1500) / 250.0) * np.sin(
            2 * np.pi * 523 * np.arange(1500) / FS
        )
        x[t0 : t0 + 1500] += ping
    return x.astype(np.float32)


def _block_env_oracle(x, B=8, H=8, smooth=True):
    n_blocks = 1 + (x.size - B) // H
    starts = np.arange(n_blocks) * H
    x2 = np.asarray(x, np.float64) ** 2
    cs = np.concatenate([[0.0], np.cumsum(x2)])
    env = np.sqrt(np.maximum((cs[starts + B] - cs[starts]) / B, 0.0))
    if smooth and env.size >= 3:
        env = np.convolve(env, [0.25, 0.5, 0.25], mode="same")
    return env


def _block_features_oracle(x, frame_len=FRAME, hop=HOP, B=8, post_pre=4, eps=1e-9):
    """Loop oracle of the block-energy peak features (scipy peak_widths)."""
    H = B
    env = _block_env_oracle(x, B, H)
    n_frames = 1 + (x.size - frame_len) // hop
    crest = np.zeros(n_frames)
    width = np.zeros(n_frames)
    ratio = np.zeros(n_frames)
    bpf = int(np.ceil(frame_len / H))
    stride = int(np.round(hop / H))
    for t in range(n_frames):
        b0 = t * stride
        b1 = min(env.size, b0 + bpf)
        if b1 <= b0:
            continue
        fe = env[b0:b1]
        rms = np.sqrt(np.mean(fe**2))
        p = int(np.argmax(fe))
        pv = float(fe[p])
        crest[t] = pv / max(rms, eps)
        if pv > eps and fe.size >= 3 and 0 < p < fe.size - 1:
            if fe[p] - max(fe[p - 1], fe[p + 1]) > eps:
                w, _, _, _ = spsig.peak_widths(fe, [p], rel_height=0.5)
                if np.isfinite(w[0]) and w[0] > 0:
                    width[t] = w[0]
        pi = b0 + p
        pre = env[max(0, pi - post_pre) : pi]
        post = env[pi + 1 : min(env.size, pi + 1 + post_pre)]
        pre_e = pre.mean() if pre.size else 0.0
        post_e = post.mean() if post.size else 0.0
        ratio[t] = np.log((post_e + eps) / (pre_e + eps))
    return crest, width, ratio


def test_subframe_energy_matches_cumsum(rng):
    x = _signal(rng)
    ours = np.asarray(subframe_energy(jnp.asarray(x), 128, 128))
    n_sub = 1 + (x.size - 128) // 128
    ref = np.array([np.mean(x[i * 128 : i * 128 + 128] ** 2) for i in range(n_sub)])
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_block_energy_features_match_oracle(rng):
    x = _signal(rng)
    crest, width, ratio = (
        np.asarray(a)
        for a in block_energy_peak_features(
            jnp.asarray(x), frame_len=FRAME, hop=HOP, block_len=8
        )
    )
    crest_ref, width_ref, ratio_ref = _block_features_oracle(x)
    np.testing.assert_allclose(crest, crest_ref, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(ratio, ratio_ref, rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(width, width_ref, rtol=2e-3, atol=1e-3)


def test_td_crest_kurtosis_match_scipy_loop(rng):
    x = _signal(rng)
    out = extract_td_features(
        jnp.asarray(x), fs=FS, frame_len=FRAME, hop=HOP,
        operating_band=(400.0, 3500.0), mode_bands=None, td_input_mode="default",
    )
    T = 1 + (x.size - FRAME) // HOP
    crest_ref = np.zeros(T)
    kurt_ref = np.zeros(T)
    for t in range(T):
        seg = x[t * HOP : t * HOP + FRAME].astype(np.float64)
        rms = np.sqrt(np.mean(seg**2) + 1e-9)
        crest_ref[t] = np.max(np.abs(seg)) / max(rms, 1e-9)
        kv = scipy.stats.kurtosis(seg, fisher=False, bias=False)
        kurt_ref[t] = kv if np.isfinite(kv) else 0.0
    np.testing.assert_allclose(np.asarray(out["td_crest_factor"]), crest_ref, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["td_kurtosis"]), kurt_ref, rtol=1e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(out["frame_times"]), np.arange(T) * HOP / FS, rtol=1e-6
    )


def test_td_features_bandpass_mode(rng):
    x = _signal(rng)
    out = extract_td_features(
        jnp.asarray(x), fs=FS, frame_len=FRAME, hop=HOP,
        operating_band=(400.0, 3500.0), mode_bands=None,
        td_input_mode="bandpass", td_input_band=(400.0, 900.0),
    )
    sos = spsig.butter(
        4,
        [np.clip(400.0, 1e-3, 0.999 * FS / 2) / (FS / 2),
         np.clip(900.0, 400.0 + 1e-3, 0.999 * FS / 2) / (FS / 2)],
        "bandpass", output="sos",
    )
    xf = spsig.sosfiltfilt(sos, x.astype(np.float64))
    T = 1 + (x.size - FRAME) // HOP
    crest_ref = np.zeros(T)
    for t in range(T):
        seg = xf[t * HOP : t * HOP + FRAME]
        crest_ref[t] = np.max(np.abs(seg)) / max(np.sqrt(np.mean(seg**2) + 1e-9), 1e-9)
    np.testing.assert_allclose(
        np.asarray(out["td_crest_factor"]), crest_ref, rtol=5e-3, atol=5e-3
    )


def test_envelope_features_fire_on_pings(rng):
    x = _signal(rng)
    out = extract_td_features(
        jnp.asarray(x), fs=FS, frame_len=FRAME, hop=HOP,
        operating_band=(400.0, 3500.0), mode_bands=None,
        envelope_features_enable=True,
    )
    peak_l = np.asarray(out["td_peak_energy"])
    assert peak_l.max() > 0
    # the strongest envelope peak should land near a ping frame
    ping_frames = [3000 // HOP, 9000 // HOP, 15000 // HOP]
    assert min(abs(int(peak_l.argmax()) - pf) for pf in ping_frames) <= 3
    # disabled path returns zeros
    out0 = extract_td_features(
        jnp.asarray(x), fs=FS, frame_len=FRAME, hop=HOP,
        operating_band=(400.0, 3500.0), mode_bands=None,
    )
    assert float(np.abs(np.asarray(out0["td_peak_energy"])).max()) == 0.0
