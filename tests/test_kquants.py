"""k-quant bit-layout tests.

Strategy (no network, no llama.cpp): each vectorized numpy dequant in
quant/kquants.py is checked against a *scalar* transcription of the public
ggml C dequant loop over random (but finite-scale) blocks, plus
quantize->dequantize roundtrip error bounds, plus a GGUF file write/read
roundtrip for the reader.
"""

import struct

import numpy as np
import pytest

from mistralrs_tpu.gguf.reader import GGMLType, GGUFFile
from mistralrs_tpu.quant import kquants

rng = np.random.default_rng(42)


def _rand_block(nbytes: int, f16_fields: list[int]) -> np.ndarray:
    """Random block bytes with sane f16 scale fields at the given offsets."""
    b = rng.integers(0, 256, size=nbytes, dtype=np.uint8)
    for off in f16_fields:
        val = np.float16(rng.uniform(-2, 2))
        b[off : off + 2] = np.frombuffer(val.tobytes(), np.uint8)
    return b


# ---- scalar references transcribed from ggml's dequantize_row_* C code ----


def _ref_q4_k(b: bytes) -> np.ndarray:
    d = np.frombuffer(b[0:2], np.float16)[0].astype(np.float32)
    dmin = np.frombuffer(b[2:4], np.float16)[0].astype(np.float32)
    scales = b[4:16]
    q = b[16:144]
    out = np.empty(256, np.float32)

    def get_scale_min(j):
        if j < 4:
            return scales[j] & 63, scales[j + 4] & 63
        sc = (scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4)
        m = (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4)
        return sc, m

    y = 0
    qoff = 0
    for j in range(0, 256, 64):
        sc1, m1 = get_scale_min(j // 32)
        sc2, m2 = get_scale_min(j // 32 + 1)
        d1, mm1 = d * sc1, dmin * m1
        d2, mm2 = d * sc2, dmin * m2
        for l in range(32):
            out[y + l] = d1 * (q[qoff + l] & 0xF) - mm1
        for l in range(32):
            out[y + 32 + l] = d2 * (q[qoff + l] >> 4) - mm2
        y += 64
        qoff += 32
    return out


def _ref_q5_k(b: bytes) -> np.ndarray:
    d = np.frombuffer(b[0:2], np.float16)[0].astype(np.float32)
    dmin = np.frombuffer(b[2:4], np.float16)[0].astype(np.float32)
    scales = b[4:16]
    qh = b[16:48]
    ql = b[48:176]
    out = np.empty(256, np.float32)

    def get_scale_min(j):
        if j < 4:
            return scales[j] & 63, scales[j + 4] & 63
        sc = (scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4)
        m = (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4)
        return sc, m

    y = 0
    qloff = 0
    u1, u2 = 1, 2
    for j in range(0, 256, 64):
        sc1, m1 = get_scale_min(j // 32)
        sc2, m2 = get_scale_min(j // 32 + 1)
        d1, mm1 = d * sc1, dmin * m1
        d2, mm2 = d * sc2, dmin * m2
        for l in range(32):
            out[y + l] = d1 * ((ql[qloff + l] & 0xF) + (16 if qh[l] & u1 else 0)) - mm1
        for l in range(32):
            out[y + 32 + l] = d2 * ((ql[qloff + l] >> 4) + (16 if qh[l] & u2 else 0)) - mm2
        y += 64
        qloff += 32
        u1 <<= 2
        u2 <<= 2
    return out


def _ref_q6_k(b: bytes) -> np.ndarray:
    ql = b[0:128]
    qh = b[128:192]
    sc = np.frombuffer(b[192:208], np.int8)
    d = np.frombuffer(b[208:210], np.float16)[0].astype(np.float32)
    out = np.empty(256, np.float32)
    y = 0
    qloff, qhoff, soff = 0, 0, 0
    for n in range(0, 256, 128):
        for l in range(32):
            is_ = l // 16
            q1 = ((ql[qloff + l] & 0xF) | (((qh[qhoff + l] >> 0) & 3) << 4)) - 32
            q2 = ((ql[qloff + l + 32] & 0xF) | (((qh[qhoff + l] >> 2) & 3) << 4)) - 32
            q3 = ((ql[qloff + l] >> 4) | (((qh[qhoff + l] >> 4) & 3) << 4)) - 32
            q4 = ((ql[qloff + l + 32] >> 4) | (((qh[qhoff + l] >> 6) & 3) << 4)) - 32
            out[y + l] = d * sc[soff + is_] * q1
            out[y + l + 32] = d * sc[soff + is_ + 2] * q2
            out[y + l + 64] = d * sc[soff + is_ + 4] * q3
            out[y + l + 96] = d * sc[soff + is_ + 6] * q4
        y += 128
        qloff += 64
        qhoff += 32
        soff += 8
    return out


def _ref_q2_k(b: bytes) -> np.ndarray:
    scales = b[0:16]
    q = b[16:80]
    d = np.frombuffer(b[80:82], np.float16)[0].astype(np.float32)
    dmin = np.frombuffer(b[82:84], np.float16)[0].astype(np.float32)
    out = np.empty(256, np.float32)
    y = 0
    qoff = 0
    is_ = 0
    for n in range(0, 256, 128):
        shift = 0
        for j in range(4):
            sc = scales[is_]
            is_ += 1
            dl, ml = d * (sc & 0xF), dmin * (sc >> 4)
            for l in range(16):
                out[y] = dl * ((q[qoff + l] >> shift) & 3) - ml
                y += 1
            sc = scales[is_]
            is_ += 1
            dl, ml = d * (sc & 0xF), dmin * (sc >> 4)
            for l in range(16, 32):
                out[y] = dl * ((q[qoff + l] >> shift) & 3) - ml
                y += 1
            shift += 2
        qoff += 32
    return out


def _ref_q3_k(b: bytes) -> np.ndarray:
    hmask = b[0:32]
    q = b[32:96]
    packed = b[96:108]
    d_all = np.frombuffer(b[108:110], np.float16)[0].astype(np.float32)
    kmask1, kmask2 = 0x03030303, 0x0F0F0F0F
    aux = list(struct.unpack("<3I", bytes(packed)))
    tmp = aux[2]
    aux = [
        (aux[0] & kmask2) | (((tmp >> 0) & kmask1) << 4),
        (aux[1] & kmask2) | (((tmp >> 2) & kmask1) << 4),
        ((aux[0] >> 4) & kmask2) | (((tmp >> 4) & kmask1) << 4),
        ((aux[1] >> 4) & kmask2) | (((tmp >> 6) & kmask1) << 4),
    ]
    scales = np.frombuffer(struct.pack("<4I", *aux), np.int8)
    out = np.empty(256, np.float32)
    y = 0
    qoff = 0
    m = 1
    is_ = 0
    for n in range(0, 256, 128):
        shift = 0
        for j in range(4):
            dl = d_all * (scales[is_] - 32)
            is_ += 1
            for l in range(16):
                val = ((q[qoff + l] >> shift) & 3) - (0 if hmask[l] & m else 4)
                out[y] = dl * val
                y += 1
            dl = d_all * (scales[is_] - 32)
            is_ += 1
            for l in range(16, 32):
                val = ((q[qoff + l] >> shift) & 3) - (0 if hmask[l] & m else 4)
                out[y] = dl * val
                y += 1
            shift += 2
            m <<= 1
        qoff += 32
    return out


SCALAR_REFS = {
    GGMLType.Q2_K: (_ref_q2_k, 84, [80, 82]),
    GGMLType.Q3_K: (_ref_q3_k, 110, [108]),
    GGMLType.Q4_K: (_ref_q4_k, 144, [0, 2]),
    GGMLType.Q5_K: (_ref_q5_k, 176, [0, 2]),
    GGMLType.Q6_K: (_ref_q6_k, 210, [208]),
}


@pytest.mark.parametrize("gtype", list(SCALAR_REFS))
def test_kquant_dequant_matches_ggml_scalar(gtype):
    fn, nbytes, f16_off = SCALAR_REFS[gtype]
    blocks = [_rand_block(nbytes, f16_off) for _ in range(4)]
    raw = np.concatenate(blocks)
    got = kquants.dequantize(raw, gtype, (4 * 256,)).reshape(4, 256)
    for i, blk in enumerate(blocks):
        want = fn(bytes(blk))
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)


def _ref_q4_0(b: bytes) -> np.ndarray:
    d = np.frombuffer(b[0:2], np.float16)[0].astype(np.float32)
    out = np.empty(32, np.float32)
    for j in range(16):
        out[j] = d * ((b[2 + j] & 0xF) - 8)
        out[j + 16] = d * ((b[2 + j] >> 4) - 8)
    return out


def _ref_q5_0(b: bytes) -> np.ndarray:
    d = np.frombuffer(b[0:2], np.float16)[0].astype(np.float32)
    qh = struct.unpack("<I", b[2:6])[0]
    out = np.empty(32, np.float32)
    for j in range(16):
        xh0 = ((qh >> j) & 1) << 4
        xh1 = ((qh >> (j + 16)) & 1) << 4
        out[j] = d * (((b[6 + j] & 0xF) | xh0) - 16)
        out[j + 16] = d * (((b[6 + j] >> 4) | xh1) - 16)
    return out


@pytest.mark.parametrize(
    "gtype,ref,nbytes,f16_off",
    [
        (GGMLType.Q4_0, _ref_q4_0, 18, [0]),
        (GGMLType.Q5_0, _ref_q5_0, 22, [0]),
    ],
)
def test_simple_quant_dequant_matches_ggml_scalar(gtype, ref, nbytes, f16_off):
    blk = _rand_block(nbytes, f16_off)
    got = kquants.dequantize(blk, gtype, (32,))
    np.testing.assert_allclose(got, ref(bytes(blk)), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "gtype,rms_bound",
    [
        # bounds ≈ theoretical blockwise-uniform quantization noise + margin
        (GGMLType.Q8_0, 0.006),
        (GGMLType.Q4_0, 0.11),
        (GGMLType.Q4_K, 0.10),
        (GGMLType.Q6_K, 0.025),
    ],
)
def test_quantize_roundtrip(gtype, rms_bound):
    x = rng.standard_normal(4096).astype(np.float32) * 0.5
    raw = kquants.quantize(x, gtype)
    be, bb = __import__(
        "mistralrs_tpu.gguf.reader", fromlist=["GGML_BLOCK_INFO"]
    ).GGML_BLOCK_INFO[gtype]
    assert raw.size == x.size // be * bb
    back = kquants.dequantize(raw, gtype, x.shape)
    rms = np.sqrt(np.mean((x - back) ** 2)) / np.sqrt(np.mean(x**2))
    assert rms < rms_bound, rms


def _write_test_gguf(path):
    """Minimal GGUF v3 writer (test-only)."""
    t1 = rng.standard_normal((8, 16)).astype(np.float32)
    t2raw = kquants.quantize(rng.standard_normal((4, 64)).astype(np.float32), GGMLType.Q8_0)

    def s(x):
        b = x.encode()
        return struct.pack("<Q", len(b)) + b

    kv = b""
    kv += s("general.architecture") + struct.pack("<I", 8) + s("llama")
    kv += s("llama.block_count") + struct.pack("<I", 4) + struct.pack("<I", 2)
    kv += s("tokenizer.ggml.tokens") + struct.pack("<I", 9) + struct.pack("<IQ", 8, 2) + s("a") + s("b")
    header = b"GGUF" + struct.pack("<IQQ", 3, 2, 3)

    tinfo = b""
    tinfo += s("t1") + struct.pack("<I", 2) + struct.pack("<QQ", 16, 8) + struct.pack("<IQ", 0, 0)
    off2 = (t1.nbytes + 31) // 32 * 32
    tinfo += s("t2") + struct.pack("<I", 2) + struct.pack("<QQ", 64, 4) + struct.pack("<IQ", 8, off2)

    body = header + kv + tinfo
    pad = (-len(body)) % 32
    data = t1.tobytes() + b"\0" * (off2 - t1.nbytes) + t2raw.tobytes()
    with open(path, "wb") as f:
        f.write(body + b"\0" * pad + data)
    return t1, t2raw


def test_gguf_reader_roundtrip(tmp_path):
    p = str(tmp_path / "test.gguf")
    t1, t2raw = _write_test_gguf(p)
    g = GGUFFile(p)
    assert g.architecture == "llama"
    assert g.metadata["llama.block_count"] == 2
    assert list(g.metadata["tokenizer.ggml.tokens"]) == ["a", "b"]
    assert g.tensors["t1"].shape == (8, 16)
    np.testing.assert_array_equal(g.tensor_f32("t1"), t1)
    ti, raw = g.raw_tensor("t2")
    assert ti.ggml_type == GGMLType.Q8_0
    np.testing.assert_array_equal(raw, t2raw)
    got = g.tensor_f32("t2")
    want = kquants.dequantize(t2raw, GGMLType.Q8_0, (4, 64))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "gtype,bits_tol",
    [
        (GGMLType.Q4_1, 0.10), (GGMLType.Q5_0, 0.06), (GGMLType.Q5_1, 0.05),
        (GGMLType.Q2_K, 0.45), (GGMLType.Q3_K, 0.25), (GGMLType.Q5_K, 0.05),
    ],
)
def test_new_quantizer_roundtrip(gtype, bits_tol):
    """quantize -> dequantize error bounded by the format's step size."""
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((8, 512)) * 0.5).astype(np.float32)
    raw = kquants.quantize(x, gtype)
    back = kquants.dequantize(raw, gtype, x.shape)
    err = np.abs(back - x)
    assert err.mean() < bits_tol * 0.5, (gtype, err.mean())
    assert err.max() < bits_tol * 4, (gtype, err.max())


@pytest.mark.parametrize("gtype", [GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q5_K,
                                   GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q4_1])
def test_new_quantizer_requantize_fixed_point(gtype):
    """Re-quantizing already-quantized values must be (near-)lossless —
    catches any layout mismatch between quantizer and dequantizer."""
    rng = np.random.default_rng(6)
    x = (rng.standard_normal((4, 512)) * 0.3).astype(np.float32)
    w1 = kquants.dequantize(kquants.quantize(x, gtype), gtype, x.shape)
    w2 = kquants.dequantize(kquants.quantize(w1, gtype), gtype, x.shape)
    np.testing.assert_allclose(w2, w1, rtol=0.09, atol=0.03)
