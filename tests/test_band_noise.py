"""Parity tests: streaming band-noise estimator scan vs a scipy loop oracle."""

import numpy as np
import jax.numpy as jnp
import scipy.signal as spsig
import pytest

from audio_processing_tools_tpu.models.band_noise import (
    BandNoiseEstimatorConfig,
    NoiseFrameDetectorConfig,
    band_noise_process,
    build_band_noise_config,
    BandNoiseEstimatorProcessor,
    hz_to_bin,
    db_to_ratio,
)

FS = 11162
EPS = 1e-12


class _OracleDetector:
    """Loop-form NoiseFrameDetector (band_noise_estimator.py:107-309)."""

    def __init__(self, det: NoiseFrameDetectorConfig, S: int):
        self.det = det
        self.S = S
        self.rain_bins = [
            (hz_to_bin(f0, det.fs, det.n_fft), hz_to_bin(f1, det.fs, det.n_fft))
            for f0, f1 in det.rain_bands_hz
        ]
        self.p0 = hz_to_bin(det.primary_hz[0], det.fs, det.n_fft)
        self.p1 = hz_to_bin(det.primary_hz[1], det.fs, det.n_fft)
        self.M_ratio = db_to_ratio(det.M_db)
        self.N_ratio = db_to_ratio(det.N_db)
        self.prev_rain_sum = None
        self.prev_primary = None
        self.prev_Eb = None
        self.hold = 0
        self.prev_Lb = None
        self.prev_Lh = None

    @staticmethod
    def _band_sum(P, b0, b1):
        b0 = max(0, min(b0, len(P) - 1))
        b1 = max(0, min(b1, len(P) - 1))
        return float(np.sum(P[b0 : b1 + 1])) if b1 >= b0 else 0.0

    def process(self, P_fft, subE, subEhpf):
        rain_sum = sum(self._band_sum(P_fft, b0, b1) for b0, b1 in self.rain_bins)
        primary = self._band_sum(P_fft, self.p0, self.p1)
        if self.prev_rain_sum is None:
            fft_rain = False
        else:
            fft_rain = (rain_sum > (self.prev_rain_sum + EPS) * self.M_ratio) and (
                primary > (self.prev_primary + EPS) * self.N_ratio
            )
        self.prev_rain_sum, self.prev_primary = rain_sum, primary

        mask = np.zeros(self.S, bool)
        d = self.det
        for s in range(self.S):
            Eb = max(float(subE[s]), EPS)
            if self.hold > 0:
                mask[s] = True
                self.hold -= 1
            triggered = False
            Eh = float(subEhpf[s])
            if Eh >= d.min_Ehpf and Eb >= d.min_Eband:
                Lb = 10 * np.log10(Eb + EPS)
                Lh = 10 * np.log10(Eh + EPS)
                if self.prev_Lb is not None:
                    dLb, dLh = Lb - self.prev_Lb, Lh - self.prev_Lh
                    if dLb >= d.band_rise_db and (dLb - dLh) >= d.excess_rise_db:
                        triggered = True
                self.prev_Lb, self.prev_Lh = Lb, Lh
            else:
                self.prev_Lb = self.prev_Lh = None
            if triggered:
                mask[s] = True
                self.hold = max(self.hold, max(0, d.k_subframes - 1))
            self.prev_Eb = Eb

        if fft_rain:
            return True, np.ones(self.S, bool)
        return False, mask


def _oracle_process(x, cfg: BandNoiseEstimatorConfig):
    """Loop-form BandNoiseEstimator (band_noise_estimator.py:516-986)."""
    nyq = 0.5 * cfg.fs
    hpf = spsig.butter(cfg.hp_order,
                       np.clip(cfg.hp_cutoff_hz / nyq, 1e-6, 0.999),
                       "highpass", output="sos")
    lo, hi = cfg.band_hz
    bpf = spsig.butter(cfg.bpf_order,
                       [np.clip(lo / nyq, 1e-6, 0.999), np.clip(hi / nyq, 1e-6, 0.999)],
                       "bandpass", output="sos")
    N = cfg.frame_len
    S = 1 + (N - cfg.subframe_len) // cfg.subhop
    det = _OracleDetector(cfg.det, S)
    W = cfg.W
    buf = np.zeros(W)
    valid = np.zeros(W, bool)
    buf_idx = np.full(W, -1, np.int64)
    wr = 0
    count_valid = 0
    frame_idx = 0
    noise_ema = 0.0
    q_eff = cfg.q
    N_E_smooth = 0.0
    hz = None
    bz = None
    out = {k: [] for k in ("N_E", "G_mag", "M_clean", "E_band", "fft_rain",
                           "rain_submask", "count_valid", "q_eff")}

    T = len(x) // N
    for t in range(T):
        frame = np.asarray(x[t * N : (t + 1) * N], np.float64)
        frame_idx += 1
        if hz is None:
            x0 = frame[0]
            hz = spsig.sosfilt_zi(hpf) * x0
            bz = spsig.sosfilt_zi(bpf) * x0
        xf, hz = spsig.sosfilt(hpf, frame, zi=hz)
        subs_h = xf.reshape(S, cfg.subframe_len)
        subEhpf = np.sum(subs_h**2, axis=1)
        X = np.fft.rfft(xf, n=cfg.det.n_fft)
        P_fft = X.real**2 + X.imag**2
        xb, bz = spsig.sosfilt(bpf, xf, zi=bz)
        Eb = float(np.sum(xb**2))
        Mb = np.sqrt(max(Eb, 0.0))
        subs_b = xb.reshape(S, cfg.subframe_len)
        subE = np.sum(subs_b**2, axis=1)

        fft_rain, rain_submask = det.process(P_fft, subE, subEhpf)

        # expire
        def expire():
            nonlocal count_valid
            if cfg.noise_buffer_ttl_frames <= 0 or count_valid <= 0:
                return
            ages = frame_idx - buf_idx
            stale = valid & (ages > cfg.noise_buffer_ttl_frames)
            n = int(stale.sum())
            if n:
                valid[stale] = False
                buf[stale] = 0
                buf_idx[stale] = -1
                count_valid = max(0, count_valid - n)

        expire()
        learn_mask = (
            np.ones(S, bool)
            if (cfg.force_learn_all or cfg.learn_during_rain)
            else ~rain_submask
        )
        learned = 0
        for s in range(S):
            if learn_mask[s]:
                j = wr
                was = valid[j]
                buf[j] = max(subE[s], cfg.eps)
                valid[j] = True
                buf_idx[j] = frame_idx
                if not was:
                    count_valid += 1
                wr = (wr + 1) % W
                learned += 1
        replenish = 0
        if cfg.noise_replenish_from_all_subframes and learned == 0:
            if (not cfg.noise_replenish_only_when_buffer_not_full) or count_valid < W:
                qn = float(np.quantile(subE, cfg.noise_replenish_q))
                j = wr
                was = valid[j]
                buf[j] = max(qn, cfg.eps)
                valid[j] = True
                buf_idx[j] = frame_idx
                if not was:
                    count_valid += 1
                wr = (wr + 1) % W
                replenish = 1
        if cfg.noise_q_adapt_enable:
            if replenish:
                q_eff = (1 - cfg.noise_q_replenish_alpha) * q_eff + \
                    cfg.noise_q_replenish_alpha * cfg.noise_replenish_q
            if learned:
                q_eff = (1 - cfg.noise_q_normal_alpha) * q_eff + \
                    cfg.noise_q_normal_alpha * cfg.q
            q_eff = float(np.clip(q_eff, 1e-6, 1 - 1e-6))

        expire()
        if count_valid < cfg.W_min:
            noise_ema = 0.0
            N_E_smooth = 0.0
            N_scalar = 0.0
        else:
            qv = float(np.quantile(buf[valid], q_eff))
            noise_ema = (1 - cfg.ema_alpha) * noise_ema + cfg.ema_alpha * qv
            N_scalar = noise_ema
        N_E_raw = S * N_scalar
        if cfg.smooth_N_E:
            raining = fft_rain or bool(rain_submask.any())
            up = cfg.ne_attack_alpha_wet if raining else cfg.ne_attack_alpha_dry
            a = up if N_E_raw > N_E_smooth else cfg.ne_release_alpha
            N_E_smooth = (1 - a) * N_E_smooth + a * N_E_raw
            N_E = N_E_smooth
        else:
            N_E = N_E_raw

        num = max(Eb - cfg.beta * N_E, 0.0)
        G_pow = num / (Eb + cfg.eps)
        G = float(np.clip(np.sqrt(np.clip(G_pow, 0, 1)), cfg.gain_floor, 1.0))
        out["N_E"].append(N_E)
        out["G_mag"].append(G)
        out["M_clean"].append(Mb * G)
        out["E_band"].append(Eb)
        out["fft_rain"].append(fft_rain)
        out["rain_submask"].append(rain_submask.copy())
        out["count_valid"].append(count_valid)
        out["q_eff"].append(q_eff)
    return {k: np.asarray(v) for k, v in out.items()}


def _signal(rng, seconds=6):
    n = FS * seconds
    x = 0.01 * rng.standard_normal(n)
    # loud 500 Hz bursts every second (rain-band energy jumps)
    for t0 in range(FS, n - 3000, FS):
        k = np.arange(2500)
        x[t0 : t0 + 2500] += 0.5 * np.exp(-k / 400.0) * np.sin(2 * np.pi * 520 * k / FS)
    return x.astype(np.float32)


@pytest.mark.parametrize("kwargs", [
    {},
    {"smooth_N_E": True},
    {"noise_replenish_from_all_subframes": True, "noise_buffer_ttl_frames": 20},
])
def test_band_noise_matches_oracle(rng, kwargs):
    cfg = BandNoiseEstimatorConfig(**kwargs)
    cfg.validate()
    x = _signal(rng)
    out = band_noise_process(jnp.asarray(x), cfg)
    ref = _oracle_process(x.astype(np.float64), cfg)

    np.testing.assert_array_equal(np.asarray(out["fft_rain_frame"]), ref["fft_rain"])
    np.testing.assert_array_equal(np.asarray(out["rain_submask"]), ref["rain_submask"])
    np.testing.assert_array_equal(
        np.asarray(out["noise_buffer_valid_count"]), ref["count_valid"]
    )
    scale = max(ref["E_band"].max(), 1e-12)
    np.testing.assert_allclose(
        np.asarray(out["E_band"]), ref["E_band"], rtol=5e-3, atol=1e-6 * scale
    )
    np.testing.assert_allclose(
        np.asarray(out["N_E"]), ref["N_E"], rtol=1e-2, atol=1e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(out["G_mag"]), ref["G_mag"], rtol=5e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["noise_effective_q"]), ref["q_eff"], rtol=1e-4
    )


def test_band_noise_detects_bursts(rng):
    cfg = BandNoiseEstimatorConfig()
    x = _signal(rng)
    out = band_noise_process(jnp.asarray(x), cfg)
    assert float(np.asarray(out["rain_submask"]).mean()) > 0.01
    # noise estimate stays near the background level, well below burst energy
    N_E = np.asarray(out["N_E"])
    E = np.asarray(out["E_band"])
    assert np.median(N_E[20:]) < 0.25 * E.max()


def test_processor_adapter(rng):
    proc = BandNoiseEstimatorProcessor()
    x = _signal(rng, seconds=3)
    metrics, state = proc.run(x, {"sample_rate": FS})
    assert metrics["n_frames"] == len(x) // 512
    for k in ("median_E_band", "median_N_E", "fft_rain_frac",
              "energy_stats__total_frame_count"):
        assert k in metrics
    assert state["processor"] == "band_noise"
    with pytest.raises(ValueError):
        proc.run(x, {"sample_rate": FS, "hop": 256})


def test_config_dotted_overrides():
    cfg = build_band_noise_config({
        "sample_rate": FS, "W": 20, "det.M_db": 9.0, "det.k_subframes": 3,
        "det": {"N_db": 4.0},
    })
    assert cfg.W == 20
    assert cfg.det.M_db == 9.0
    assert cfg.det.N_db == 4.0
    assert cfg.det.k_subframes == 3


def test_config_validation():
    with pytest.raises(ValueError):
        BandNoiseEstimatorConfig(subframe_len=100).validate()
    with pytest.raises(ValueError):
        BandNoiseEstimatorConfig(q=1.5).validate()
    with pytest.raises(ValueError):
        BandNoiseEstimatorConfig(W=5, W_min=10).validate()


def test_batched_vmap(rng):
    import jax

    cfg = BandNoiseEstimatorConfig()
    xb = np.stack([_signal(rng, 2), _signal(rng, 2)])
    outb = jax.vmap(lambda x: band_noise_process(x, cfg))(jnp.asarray(xb))
    out0 = band_noise_process(jnp.asarray(xb[0]), cfg)
    np.testing.assert_allclose(
        np.asarray(outb["N_E"])[0], np.asarray(out0["N_E"]), rtol=1e-5
    )


def test_chunked_streaming_matches_full(rng):
    """Chunked carry threading == one-shot clip processing (bit-identical)."""
    import jax

    from audio_processing_tools_tpu.models.band_noise import (
        band_noise_init_state,
        band_noise_process_chunk,
        band_noise_reset_noise_estimator,
    )

    cfg = BandNoiseEstimatorConfig()
    x = _signal(rng, seconds=4)
    usable = x.size // 512 * 512
    full = band_noise_process(jnp.asarray(x[:usable]), cfg)
    full = jax.tree_util.tree_map(np.asarray, full)

    state = band_noise_init_state(cfg)
    parts = []
    chunk = 512 * 17  # odd chunking
    for i in range(0, usable, chunk):
        piece = x[i : min(i + chunk, usable)]
        piece = piece[: piece.size // 512 * 512]
        if piece.size == 0:
            break
        out, state = band_noise_process_chunk(jnp.asarray(piece), cfg, state)
        parts.append(jax.tree_util.tree_map(np.asarray, out))
    cat = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
    for k in ("N_E", "G_mag", "E_band", "noise_effective_q"):
        np.testing.assert_allclose(cat[k], full[k], rtol=1e-5, atol=1e-8,
                                   err_msg=k)
    np.testing.assert_array_equal(cat["rain_submask"], full["rain_submask"])
    np.testing.assert_array_equal(
        cat["noise_buffer_valid_count"], full["noise_buffer_valid_count"]
    )

    # mid-stream estimator reset clears the buffer but keeps the stream alive
    state2 = band_noise_reset_noise_estimator(cfg, state)
    out2, state2 = band_noise_process_chunk(
        jnp.asarray(x[:512 * 4]), cfg, state2
    )
    assert int(np.asarray(out2["noise_buffer_valid_count"])[0]) <= cfg.W
    assert float(np.asarray(out2["N_E"])[0]) == 0.0  # warmup restarted


# ---------------------------------------------------------------------------
# per-frame streaming class surface (reference band_noise_estimator.py classes)


def test_streaming_class_matches_whole_clip(rng):
    from audio_processing_tools_tpu.models.band_noise_streaming import (
        BandNoiseEstimator,
        BandNoiseFrameOut,
    )

    cfg = BandNoiseEstimatorConfig()
    x = _signal(rng, seconds=3)
    ref = band_noise_process(jnp.asarray(x), cfg)

    est = BandNoiseEstimator(cfg)
    outs = list(est.process_stream(x))
    T = x.size // cfg.frame_len
    assert len(outs) == T
    assert all(isinstance(o, BandNoiseFrameOut) for o in outs)
    # per-frame streaming == one whole-clip scan, bit for bit
    np.testing.assert_array_equal(
        np.asarray([o.N_E for o in outs], np.float32), np.asarray(ref["N_E"])
    )
    np.testing.assert_array_equal(
        np.asarray([o.G_mag for o in outs], np.float32), np.asarray(ref["G_mag"])
    )
    np.testing.assert_array_equal(
        np.stack([o.rain_submask for o in outs]), np.asarray(ref["rain_submask"])
    )
    assert [o.fft_rain_frame for o in outs] == list(
        np.asarray(ref["fft_rain_frame"]).astype(bool)
    )

    with pytest.raises(ValueError, match="frame_len"):
        est.process_frame(x[:10])


def test_streaming_energy_stats_read_and_reset(rng):
    from audio_processing_tools_tpu.models.band_noise_streaming import (
        BandNoiseEstimator,
    )

    cfg = BandNoiseEstimatorConfig()
    x = _signal(rng, seconds=4)
    N = cfg.frame_len
    T = x.size // N

    est = BandNoiseEstimator(cfg)
    # empty read before any frame
    assert est.read_and_reset_energy_stats().total_frame_count == 0

    half = T // 2
    for t in range(half):
        est.process_frame(x[t * N : (t + 1) * N])
    s1 = est.read_and_reset_energy_stats()
    assert s1.total_frame_count == half
    for t in range(half, T):
        est.process_frame(x[t * N : (t + 1) * N])
    s2 = est.read_and_reset_energy_stats()
    assert s2.total_frame_count == T - half
    # windows partition the whole-clip totals
    ref = band_noise_process(jnp.asarray(x[: T * N]), cfg)
    total = float(np.asarray(ref["total_energy_sum"])[-1])
    assert abs((s1.total_energy_sum + s2.total_energy_sum) - total) <= (
        1e-6 * max(total, 1.0)
    )
    assert s1.rain_frame_count + s2.rain_frame_count == int(
        np.asarray(ref["rain_frame_count"])[-1]
    )
    # means derive from the window
    assert s2.total_energy_mean == pytest.approx(
        s2.total_energy_sum / max(1, s2.total_frame_count)
    )
    assert "noise_energy_mean" in s2.as_dict()


def test_noise_frame_detector_twin_matches_scan(rng):
    """Standalone NumPy NoiseFrameDetector == the in-scan detector."""
    import jax.numpy as jnp

    from audio_processing_tools_tpu.models.band_noise import (
        _design_filters,
        _per_frame_inputs,
    )
    from audio_processing_tools_tpu.models.band_noise_streaming import (
        NoiseFrameDetector,
    )
    from audio_processing_tools_tpu.ops.filters import sosfilt, sosfilt_zi

    cfg = BandNoiseEstimatorConfig()
    x = _signal(rng, seconds=3)
    ref = band_noise_process(jnp.asarray(x), cfg)

    # rebuild the scan's per-frame inputs
    N = cfg.frame_len
    T = x.size // N
    xs = jnp.asarray(x[: T * N], jnp.float32)
    hpf, bpf = _design_filters(cfg)
    x0 = xs[0]
    if hpf is not None:
        x_h, _ = sosfilt(hpf, xs, zi=jnp.asarray(sosfilt_zi(hpf), jnp.float32) * x0)
    else:
        x_h = xs
    x_bp, _ = sosfilt(bpf, x_h, zi=jnp.asarray(sosfilt_zi(bpf), jnp.float32) * x0)
    subE, subEhpf, *_ = _per_frame_inputs(x_h, x_bp, cfg, T)
    frames_h = np.asarray(x_h).reshape(T, N)
    P_fft = np.abs(np.fft.rfft(frames_h, n=cfg.det.n_fft, axis=-1)) ** 2

    S = subE.shape[-1]
    det = NoiseFrameDetector(cfg.det, subframes_per_frame=S)
    got_fft, got_mask = [], []
    for t in range(T):
        fr, mask = det.process_frame(
            frames_h[t], np.asarray(subE[t]),
            subEhpf=np.asarray(subEhpf[t]), fft_power=P_fft[t],
        )
        got_fft.append(fr)
        got_mask.append(mask)
    np.testing.assert_array_equal(
        np.asarray(got_fft), np.asarray(ref["fft_rain_frame"]).astype(bool)
    )
    np.testing.assert_array_equal(
        np.stack(got_mask), np.asarray(ref["rain_submask"]).astype(bool)
    )
