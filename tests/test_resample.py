"""Frequency-domain resampler quality tests.

Port of the reference's Goertzel suite (``src/audio/resample.rs:240-338``):
tone preservation, amplitude preservation, and — the one test that can tell a
real resampler from a naive decimator — anti-aliasing of content above the
output Nyquist. Runs against both the host numpy path and the jnp device
path (which must be numerically equivalent, since parity is won in the
front-end).
"""

import numpy as np
import pytest

from birda_tpu.audio.resample import resample, resample_chunk
from birda_tpu.ops.resample import resample_device

TEST_RATE_HIGH = 48_000
TEST_RATE_LOW = 32_000
TEST_RATE_CD = 44_100
BIRD_BAND_HZ = 6_000.0
REFERENCE_TONE_HZ = 1_000.0
ABOVE_NYQUIST_HZ = 20_000.0
ALIAS_IMAGE_HZ = 12_000.0
DOMINANCE_RATIO = 100.0
MIN_TONE_POWER_FRACTION = 0.5
FILTERED_RMS_CEILING = 0.1
PRESERVED_RMS_FLOOR = 0.6
RMS_TOLERANCE = 0.05
ALIAS_POWER_FRACTION = 1e-6


def sine(freq_hz, rate, n):
    return np.sin(2 * np.pi * freq_hz * np.arange(n) / rate).astype(np.float32)


def tone_power(samples, rate, freq_hz):
    """Goertzel power at one frequency (phase-shift insensitive)."""
    from scipy.signal import lfilter

    s = np.asarray(samples, np.float64)
    n = len(s)
    k = round(n * freq_hz / rate)
    w = 2 * np.pi * k / n
    coeff = 2 * np.cos(w)
    # The Goertzel recurrence s0 = coeff*s1 - s2 + x is the IIR filter
    # 1 / (1 - coeff z^-1 + z^-2); lfilter runs it in C.
    out = lfilter([1.0], [1.0, -coeff, 1.0], s)
    s1, s2 = out[-1], out[-2] if n > 1 else 0.0
    return max(s1 * s1 + s2 * s2 - coeff * s1 * s2, 0.0) / n


def rms(s):
    return float(np.sqrt(np.mean(np.square(s))))


def steady_state(s):
    m = len(s) // 8
    return s[m : len(s) - m]


def expected_tone_power(n):
    return n / 4.0


def assert_tone_intact(body, rate, tone_hz, other_bins):
    at_tone = tone_power(body, rate, tone_hz)
    floor = expected_tone_power(len(body)) * MIN_TONE_POWER_FRACTION
    assert at_tone > floor, f"{tone_hz} Hz tone lost power: {at_tone} < {floor}"
    for other in other_bins:
        at_other = tone_power(body, rate, other)
        assert at_tone > at_other * DOMINANCE_RATIO, (
            f"{tone_hz} Hz did not dominate {other} Hz: {at_tone} vs {at_other}"
        )


def run(samples, from_rate, to_rate, path):
    if path == "host":
        return resample(samples, from_rate, to_rate)
    out = resample_device(samples[None, :], from_rate, to_rate)
    return np.asarray(out)[0]


@pytest.fixture(params=["host", "device"])
def path(request):
    return request.param


class TestQuality:
    def test_preserves_tone_frequency(self, path):
        out = run(sine(REFERENCE_TONE_HZ, TEST_RATE_HIGH, TEST_RATE_HIGH),
                  TEST_RATE_HIGH, TEST_RATE_LOW, path)
        assert_tone_intact(steady_state(out), TEST_RATE_LOW, REFERENCE_TONE_HZ,
                           [500.0, 2_000.0, 4_000.0])

    def test_preserves_bird_band_content(self, path):
        out = run(sine(BIRD_BAND_HZ, TEST_RATE_HIGH, TEST_RATE_HIGH),
                  TEST_RATE_HIGH, TEST_RATE_LOW, path)
        body = steady_state(out)
        assert_tone_intact(body, TEST_RATE_LOW, BIRD_BAND_HZ,
                           [3_000.0, 9_000.0, 12_000.0])
        assert rms(body) > PRESERVED_RMS_FLOOR

    def test_filters_content_above_output_nyquist(self, path):
        # The anti-aliasing test: 20 kHz fits under the input Nyquist (24 kHz)
        # but not the output's (16 kHz); a naive decimator folds it to 12 kHz.
        out = run(sine(ABOVE_NYQUIST_HZ, TEST_RATE_HIGH, TEST_RATE_HIGH),
                  TEST_RATE_HIGH, TEST_RATE_LOW, path)
        body = steady_state(out)
        alias = tone_power(body, TEST_RATE_LOW, ALIAS_IMAGE_HZ)
        ceiling = expected_tone_power(len(body)) * ALIAS_POWER_FRACTION
        assert alias < ceiling, f"20 kHz folded back to 12 kHz: power {alias}"
        assert rms(body) < FILTERED_RMS_CEILING

    def test_cd_rate_filters_above_output_nyquist(self, path):
        # 44.1 kHz -> 32 kHz reduces to L/M = 320/441 — a completely different
        # polyphase decomposition than 48 kHz's 2/3.
        out = run(sine(ABOVE_NYQUIST_HZ, TEST_RATE_CD, TEST_RATE_CD),
                  TEST_RATE_CD, TEST_RATE_LOW, path)
        assert rms(steady_state(out)) < FILTERED_RMS_CEILING

    def test_cd_rate_preserves_bird_band_content(self, path):
        out = run(sine(BIRD_BAND_HZ, TEST_RATE_CD, TEST_RATE_CD),
                  TEST_RATE_CD, TEST_RATE_LOW, path)
        assert_tone_intact(steady_state(out), TEST_RATE_LOW, BIRD_BAND_HZ,
                           [3_000.0, 9_000.0, 12_000.0])

    def test_preserves_amplitude(self, path):
        x = sine(REFERENCE_TONE_HZ, TEST_RATE_HIGH, TEST_RATE_HIGH)
        out = run(x, TEST_RATE_HIGH, TEST_RATE_LOW, path)
        assert abs(rms(steady_state(out)) - rms(x)) < RMS_TOLERANCE


class TestShapes:
    def test_same_rate_returns_input(self):
        x = np.array([0.1, 0.2, 0.3, 0.4, 0.5], np.float32)
        assert np.array_equal(resample(x, 48000, 48000), x)

    def test_downsample_length(self):
        out = resample(sine(100, 48000, 48000), 48000, 32000)
        assert len(out) == 32000

    def test_upsample_length(self):
        out = resample(sine(100, 32000, 32000), 32000, 48000)
        assert len(out) == 48000

    def test_cd_length(self):
        out = resample(sine(100, 44100, 44100), 44100, 48000)
        assert 47999 <= len(out) <= 48001

    def test_chunk_alias(self):
        x = sine(1000, 48000, 4800)
        assert np.array_equal(resample_chunk(x, 48000, 32000),
                              resample(x, 48000, 32000))

    def test_host_device_parity(self):
        # The two paths share one filter design; scores parity starts here.
        x = sine(3210.5, 44100, 44100)
        host = resample(x, 44100, 32000)
        dev = np.asarray(resample_device(x[None, :], 44100, 32000))[0]
        assert np.max(np.abs(host - dev)) < 1e-5

    def test_batched_device(self):
        x = np.stack([sine(1000, 48000, 14400), sine(2000, 48000, 14400)])
        out = np.asarray(resample_device(x, 48000, 32000))
        assert out.shape == (2, 9600)


class TestBlockedDevicePath:
    """The any-ratio blocked-matmul device form (44.1 kHz production path)."""

    @pytest.mark.parametrize("rates", [(44100, 48000), (44100, 32000),
                                       (22050, 48000), (8000, 48000)])
    def test_matches_host_exactly(self, rates):
        fr, to = rates
        x = np.random.default_rng(5).normal(0, 0.3, 30_000).astype(np.float32)
        want = resample(x, fr, to)
        got = np.asarray(resample_device(x[None, :], fr, to))[0]
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) < 1e-5

    def test_cd_to_model_rate_supported(self):
        from birda_tpu.ops.resample import device_resample_supported

        # The reference resamples any rate (src/audio/resample.rs:10-91);
        # with the blocked form, so does the device path.
        assert device_resample_supported(44100, 48000)
        assert device_resample_supported(44100, 32000)

    def test_chunk_runner_44k1_end_to_end(self):
        """A 44.1 kHz chunk shipped raw to the device, resampled in-graph,
        classified — no host per-sample work (VERDICT r1 item 4)."""
        from birda_tpu.inference.classifier import BirdClassifier
        from birda_tpu.models.zoo import tiny_model

        clf = BirdClassifier(tiny_model(), device="cpu",
                             min_confidence=0.0, top_k=3)
        # f32 transport isolates the device-resample path from int16
        # quantization noise (synthetic-model scores are near-tied, so
        # quantization can legitimately swap top-1).
        runner = clf.chunk_runner(batch_size=2, step_samples=144_000,
                                  transport="f32", src_rate=44_100)
        assert runner.resample_on_device
        assert runner.src_rate == 44_100
        rng = np.random.default_rng(6)
        chunk441 = rng.normal(0, 0.1, runner.chunk_samples).astype(np.float32)
        results = runner.predict_chunk(chunk441, n_real=2)
        assert len(results) == 2

        # Reference computation: host-resample the same chunk, then run the
        # model-rate windows through the batch path.
        x48 = resample(chunk441, 44_100, 48_000)[: (2 - 1) * 144_000 + 144_000]
        wins = np.stack([x48[0:144_000], x48[144_000:288_000]])
        want = clf.predict_batch(wins)
        for got_r, want_r in zip(results, want):
            assert got_r.predictions[0].index == want_r.predictions[0].index
            assert abs(
                got_r.predictions[0].confidence
                - want_r.predictions[0].confidence
            ) < 1e-4
