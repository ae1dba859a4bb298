"""Convention parity for the staged ragged-paged-attention adoption
(ops/ragged_attention.py): the upstream kernel's reference implementation
must agree with this repo's sdpa + mask conventions through our adapters
(combined even/odd KV interleave, flattened cu_q_lens queries, window edge,
softcap-after-scale order, GQA). On-chip kernel test:
tests/test_tpu_paths.py::test_ragged_kernel_on_chip."""

import jax.numpy as jnp
import numpy as np
import pytest

from mistralrs_tpu.ops import attention as attn_ops
from mistralrs_tpu.ops.ragged_attention import combine_kv, flatten_queries


@pytest.mark.parametrize("window,softcap", [(None, None), (16, None),
                                            (None, 30.0), (16, 30.0)])
def test_ref_kernel_matches_sdpa_mixed_batch(window, softcap):
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ref_ragged_paged_attention,
    )

    rng = np.random.default_rng(7)
    Hq, Hkv, D, page = 4, 2, 16, 4
    # mixed batch: decode (1 q tok), first chunk (8), continuation (4)
    q_lens = [1, 8, 4]
    kv_lens = [20, 8, 30]
    P = 64
    pages_per_seq = max(-(-kv // page) for kv in kv_lens)
    T = max(q_lens)
    B = len(q_lens)

    # head-major per-layer pools like PagedKVCache: [Hkv, P, page, D]
    k_hm = jnp.asarray(rng.standard_normal((Hkv, P, page, D)), jnp.float32)
    v_hm = jnp.asarray(rng.standard_normal((Hkv, P, page, D)), jnp.float32)
    tables = np.zeros((B, pages_per_seq), np.int32)
    next_page = 1
    for i, kv in enumerate(kv_lens):
        n = -(-kv // page)
        tables[i, :n] = np.arange(next_page, next_page + n)
        next_page += n

    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)), jnp.float32)
    scale = D**-0.5

    q_flat, cu = flatten_queries(q, jnp.asarray(q_lens, jnp.int32))
    got = ref_ragged_paged_attention(
        q_flat[: sum(q_lens)], combine_kv(k_hm, v_hm),
        jnp.asarray(kv_lens, jnp.int32), jnp.asarray(tables),
        cu, jnp.asarray([B], jnp.int32),
        sm_scale=scale, sliding_window=window, soft_cap=softcap,
    )
    got = np.asarray(got, np.float32)

    # per-sequence dense reference through the repo's own conventions
    off = 0
    for i in range(B):
        ql, kvl = q_lens[i], kv_lens[i]
        # gather this seq's kv from the pools via its table
        idx = tables[i, : -(-kvl // page)]
        k_seq = np.asarray(k_hm)[:, idx].transpose(1, 2, 0, 3).reshape(
            -1, Hkv, D)[:kvl]
        v_seq = np.asarray(v_hm)[:, idx].transpose(1, 2, 0, 3).reshape(
            -1, Hkv, D)[:kvl]
        bias = attn_ops.causal_mask_bias(
            ql, kvl, q_offsets=jnp.asarray([kvl - ql]), sliding_window=window)
        want = attn_ops.sdpa(
            q[i : i + 1, :ql], jnp.asarray(k_seq)[None], jnp.asarray(v_seq)[None],
            scale=scale, mask=bias, logits_softcap=softcap)
        np.testing.assert_allclose(
            got[off : off + ql], np.asarray(want)[0], rtol=2e-5, atol=2e-5,
            err_msg=f"seq {i} window={window} softcap={softcap}")
        off += ql


def test_flatten_queries_packing():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((3, 4, 2, 8)), jnp.float32)
    q_lens = jnp.asarray([1, 4, 2], jnp.int32)
    flat, cu = flatten_queries(q, q_lens)
    assert list(np.asarray(cu)) == [0, 1, 5, 7]
    np.testing.assert_array_equal(np.asarray(flat[0]), np.asarray(q[0, 0]))
    np.testing.assert_array_equal(np.asarray(flat[1:5]), np.asarray(q[1, :4]))
    np.testing.assert_array_equal(np.asarray(flat[5:7]), np.asarray(q[2, :2]))
