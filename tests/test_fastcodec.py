"""Native fastcodec parity vs pure-Python codecs (skips if unbuilt)."""
import numpy as np
import pytest

from ttc.io import fastcodec as fc


def test_deflate_roundtrip(rng):
    data = rng.integers(0, 255, 1024 * 256, dtype=np.uint8)
    strips = fc.deflate_strips(data, 8)
    back = fc.inflate_strips(strips, len(data) // 8)
    assert back == data.tobytes()


def test_u16_f32_parity(rng):
    u = rng.integers(0, 65535, 100_000).astype(np.uint16)
    np.testing.assert_allclose(fc.u16_to_f32(u), u / 65535.0, rtol=1e-6)
    x = rng.random(100_000).astype(np.float32)
    np.testing.assert_array_equal(
        fc.f32_to_u16(x),
        np.trunc(np.clip(x, 0, 1) * 65535).astype(np.uint16))


def test_fallback_without_library(monkeypatch, rng):
    monkeypatch.setattr(fc, "_load", lambda: None)
    data = rng.integers(0, 255, 4096, dtype=np.uint8)
    strips = fc.deflate_strips(data, 4)
    assert fc.inflate_strips(strips, 1024) == data.tobytes()
    u = rng.integers(0, 65535, 1000).astype(np.uint16)
    np.testing.assert_allclose(fc.u16_to_f32(u), u / 65535.0)
