"""Literal golden vectors for the GGUF wire formats (VERDICT r3 weak #6).

Every other dequant test in this repo checks the vectorized unpack against
scalar transcriptions of ggml's C loops — independent code paths, but a
misreading of the spec could be transcribed into both, and the writer/
reader roundtrip is self-referential by construction. Here the wire BYTES
and the expected f32 outputs are both written as literals, derived BY HAND
on paper from the public ggml block layouts (ggml-quants.c dequant_row_*):
if the repo's reader, writer, and scalar oracle all shared a layout bug,
these would catch it.

Construction notes (hand math, kept deliberately simple):
- f16 literals: 1.0 = 0x3C00, 0.5 = 0x3800, 2.0 = 0x4000, 0.25 = 0x3400
  (little-endian on the wire: [0x00, 0x3C] etc.).
- Q4_K/Q5_K 6-bit scale packing (get_scale_min_k4): j<4: sc=s[j]&63,
  m=s[j+4]&63; j>=4: sc=(s[j+4]&0xF)|((s[j-4]>>6)<<4),
  m=(s[j+4]>>4)|((s[j]>>6)<<4).
"""

import numpy as np
import pytest

from mistralrs_tpu.gguf.reader import GGMLType
from mistralrs_tpu.quant import kquants


def _deq(raw_bytes: list[int], gtype, n: int) -> np.ndarray:
    raw = np.asarray(raw_bytes, np.uint8)
    return kquants.dequantize(raw, gtype, (1, n)).reshape(n)


def test_golden_q8_0():
    # d = 0.5; qs[i] = i - 16  =>  w[i] = 0.5 * (i - 16)
    raw = [0x00, 0x38] + [(i - 16) & 0xFF for i in range(32)]
    want = 0.5 * (np.arange(32) - 16.0)
    np.testing.assert_allclose(_deq(raw, GGMLType.Q8_0, 32), want, atol=0)


def test_golden_q4_0():
    # d = 2.0; every qs byte 0x21: elems 0-15 = lo nibble 1, 16-31 = hi 2
    # w = d * (q - 8)  =>  [-14.0] * 16 + [-12.0] * 16
    raw = [0x00, 0x40] + [0x21] * 16
    want = np.repeat([-14.0, -12.0], 16)
    np.testing.assert_allclose(_deq(raw, GGMLType.Q4_0, 32), want, atol=0)


def test_golden_q4_1():
    # d = 1.0, m = 0.25; qs 0x21  =>  w = q + 0.25 = [1.25]*16 + [2.25]*16
    raw = [0x00, 0x3C, 0x00, 0x34] + [0x21] * 16
    want = np.repeat([1.25, 2.25], 16)
    np.testing.assert_allclose(_deq(raw, GGMLType.Q4_1, 32), want, atol=0)


def test_golden_q5_0():
    # d = 1.0; qh = all-ones (every element's 5th bit set); qs 0x21
    # q = nib | 16  =>  w = d * (q - 16) = [1.0]*16 + [2.0]*16
    raw = [0x00, 0x3C, 0xFF, 0xFF, 0xFF, 0xFF] + [0x21] * 16
    want = np.repeat([1.0, 2.0], 16)
    np.testing.assert_allclose(_deq(raw, GGMLType.Q5_0, 32), want, atol=0)


def test_golden_q5_1():
    # d = 0.5, m = 0.25; qh all-ones; qs 0x21
    # w = 0.5 * (nib | 16) + 0.25 = [8.75]*16 + [9.25]*16
    raw = [0x00, 0x38, 0x00, 0x34, 0xFF, 0xFF, 0xFF, 0xFF] + [0x21] * 16
    want = np.repeat([8.75, 9.25], 16)
    np.testing.assert_allclose(_deq(raw, GGMLType.Q5_1, 32), want, atol=0)


# Q4_K scale bytes: sc = [1..8], m = [1,1,1,1,1,2,3,4] (see packing note)
_K4_SCALES = [1, 2, 3, 4, 1, 1, 1, 1, 0x15, 0x26, 0x37, 0x48]


def test_golden_q4_k():
    # d = 1.0, dmin = 0.5; every qs byte 0x21: within each 64-elem chunk,
    # elems 0-31 have q = 1 (lo nibble), 32-63 have q = 2 (hi nibble).
    # Sub-block j (32 elems): w = d*sc[j]*q_j - dmin*m[j] with
    # q = [1,2,1,2,1,2,1,2][j]:
    #   j0: 1*1-0.5 = 0.5    j1: 2*2-0.5 = 3.5   j2: 3*1-0.5 = 2.5
    #   j3: 4*2-0.5 = 7.5    j4: 5*1-0.5 = 4.5   j5: 6*2-1.0 = 11.0
    #   j6: 7*1-1.5 = 5.5    j7: 8*2-2.0 = 14.0
    raw = [0x00, 0x3C, 0x00, 0x38] + _K4_SCALES + [0x21] * 128
    want = np.repeat([0.5, 3.5, 2.5, 7.5, 4.5, 11.0, 5.5, 14.0], 32)
    np.testing.assert_allclose(_deq(raw, GGMLType.Q4_K, 256), want, atol=0)


def test_golden_q5_k():
    # Same d/dmin/scales/qs as the Q4_K case; qh = 0xFF everywhere sets the
    # 5th bit of every element  =>  q = [17,18,...] per sub-block:
    #   j0: 1*17-0.5 = 16.5   j1: 2*18-0.5 = 35.5  j2: 3*17-0.5 = 50.5
    #   j3: 4*18-0.5 = 71.5   j4: 5*17-0.5 = 84.5  j5: 6*18-1 = 107.0
    #   j6: 7*17-1.5 = 117.5  j7: 8*18-2 = 142.0
    raw = ([0x00, 0x3C, 0x00, 0x38] + _K4_SCALES + [0xFF] * 32 + [0x21] * 128)
    want = np.repeat([16.5, 35.5, 50.5, 71.5, 84.5, 107.0, 117.5, 142.0], 32)
    np.testing.assert_allclose(_deq(raw, GGMLType.Q5_K, 256), want, atol=0)


def test_golden_q6_k():
    # ql all 0x21, qh all 0x1B (= bits [3,2,1,0] at offsets 0/2/4/6),
    # scales int8 = [1..16], d = 0.5. Per 128-half, 32-elem spans get
    # q1 = 1|(3<<4) = 49, q2 = 1|(2<<4) = 33, q3 = 2|(1<<4) = 18,
    # q4 = 2|(0<<4) = 2. w = d * sc[i/16] * (q - 32), sc = block_idx + 1:
    raw = ([0x21] * 128 + [0x1B] * 64 + list(range(1, 17)) + [0x00, 0x38])
    q_per_block = np.repeat([49, 33, 18, 2, 49, 33, 18, 2], 2)  # per 16-block
    want = np.repeat(0.5 * np.arange(1, 17) * (q_per_block - 32.0), 16)
    np.testing.assert_allclose(_deq(raw, GGMLType.Q6_K, 256), want, atol=0)


def test_golden_q2_k():
    # scales all 0x11 (sc = 1, m = 1); qs all 0xE4 (2-bit values [0,1,2,3]
    # at offsets 0/2/4/6); d = 1.0, dmin = 0.5. Each 128-half: 32-elem
    # spans have q = 0,1,2,3  =>  w = q - 0.5:
    raw = ([0x11] * 16 + [0xE4] * 64 + [0x00, 0x3C, 0x00, 0x38])
    want = np.tile(np.repeat([-0.5, 0.5, 1.5, 2.5], 32), 2)
    np.testing.assert_allclose(_deq(raw, GGMLType.Q2_K, 256), want, atol=0)


def test_golden_q3_k():
    # hmask all 0xFF (no -4 anywhere); qs all 0xE4 (q3 = 0,1,2,3 per span);
    # scale packing: bytes 0-7 = 0x11 (lo4 of sc[0:8] and sc[8:16] = 1),
    # bytes 8-11 = 0xAA (every 2-bit high = 2)  =>  sc[k] = 1|(2<<4) = 33,
    # minus 32  =>  1 for all k. d = 1.0  =>  w = q3 per 32-elem span:
    raw = ([0xFF] * 32 + [0xE4] * 64 + [0x11] * 8 + [0xAA] * 4
           + [0x00, 0x3C])
    want = np.tile(np.repeat([0.0, 1.0, 2.0, 3.0], 32), 2)
    np.testing.assert_allclose(_deq(raw, GGMLType.Q3_K, 256), want, atol=0)
