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


def test_encode_s2_compact_native_parity(rng):
    """The native encoder is a valid compact-wire encoder: decoded
    fidelity equal to the numpy encoder's (the two may round residual
    scales differently — see ttc/io/wire.py — so streams aren't
    bit-compared, decoded errors are)."""
    if not fc.available():
        pytest.skip("native library not built")
    import jax.numpy as jnp

    from ttc.io.wire import decode_s2_compact, encode_s2_compact

    for t, h, w, b in ((8, 64, 64, 4), (13, 50, 50, 6)):
        u = rng.integers(0, 65535, (t, h, w, b)).astype(np.uint16)
        x = u.astype(np.float32) / 65535.0
        out = fc.encode_s2_compact_native(u)
        assert out is not None
        data, sc = out
        assert data.shape == (t + 1, h, w, b) and data.dtype == np.int8
        assert sc.shape == (t + 2, b) and sc.dtype == np.float32
        dec_nat = np.asarray(decode_s2_compact(jnp.asarray(data),
                                               jnp.asarray(sc)))
        d_np, s_np = encode_s2_compact(u, native=False)
        dec_np = np.asarray(decode_s2_compact(jnp.asarray(d_np),
                                              jnp.asarray(s_np)))
        err_nat = np.abs(dec_nat - x).max()
        err_np = np.abs(dec_np - x).max()
        assert err_nat <= err_np * 1.05 + 1e-5, (err_nat, err_np)


def test_fallback_without_library(monkeypatch, rng):
    monkeypatch.setattr(fc, "_load", lambda: None)
    data = rng.integers(0, 255, 4096, dtype=np.uint8)
    strips = fc.deflate_strips(data, 4)
    assert fc.inflate_strips(strips, 1024) == data.tobytes()
    u = rng.integers(0, 65535, 1000).astype(np.uint16)
    np.testing.assert_allclose(fc.u16_to_f32(u), u / 65535.0)
