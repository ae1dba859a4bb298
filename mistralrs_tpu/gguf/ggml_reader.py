"""Legacy GGML/GGMF/GGJT file reader (pre-GGUF llama.cpp format).

Reference parity: mistralrs-core/src/pipeline/ggml.rs loads via candle's
`ggml_file::Content` — llama-architecture only, hparams header + embedded
vocab + tensors; GQA models need the external `gqa` parameter because the
header has no kv-head count (utils/model_config.rs:19). Tensor payloads use
the same quant block formats as GGUF, so dequant/packing is shared
(quant/kquants.py, quant/gguf_linear.py).

Layout (little-endian):
  magic:  0x67676d6c "ggml" (no version) | 0x67676d66 "ggmf" | 0x67676a74
          "ggjt" (versioned; ggjt pads tensor data to 32 bytes)
  hparams: n_vocab n_embd n_mult n_head n_layer n_rot ftype  (7 x i32)
  vocab:  n_vocab x { len:u32, bytes, score:f32 (ggml-no-version omits) }
  tensors: { n_dims:u32, name_len:u32, dtype:u32, dims[n_dims]:u32,
             name, [align 32 for ggjt], data }
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from mistralrs_tpu.gguf.reader import GGML_BLOCK_INFO, GGMLType

MAGIC_GGML = 0x67676D6C
MAGIC_GGMF = 0x67676D66
MAGIC_GGJT = 0x67676A74


@dataclasses.dataclass
class GgmlHParams:
    n_vocab: int
    n_embd: int
    n_mult: int
    n_head: int
    n_layer: int
    n_rot: int
    ftype: int

    @property
    def n_ff(self) -> int:
        # llama.cpp convention for the legacy header
        return ((2 * (4 * self.n_embd) // 3 + self.n_mult - 1) // self.n_mult) * self.n_mult


@dataclasses.dataclass
class GgmlTensor:
    name: str
    dims: tuple[int, ...]  # ggml order (fastest first)
    gtype: GGMLType
    raw: np.ndarray  # packed bytes

    @property
    def shape(self) -> tuple[int, ...]:
        """Numpy/torch (out, in)-style shape: reversed ggml dims."""
        return tuple(reversed(self.dims))


@dataclasses.dataclass
class GgmlContent:
    hparams: GgmlHParams
    vocab: list[tuple[bytes, float]]  # (token bytes, score)
    tensors: dict[str, GgmlTensor]


def read_ggml(path: str) -> GgmlContent:
    with open(path, "rb") as f:
        data = f.read()
    off = 0

    def u32():
        nonlocal off
        (v,) = struct.unpack_from("<I", data, off)
        off += 4
        return v

    def f32():
        nonlocal off
        (v,) = struct.unpack_from("<f", data, off)
        off += 4
        return v

    magic = u32()
    if magic not in (MAGIC_GGML, MAGIC_GGMF, MAGIC_GGJT):
        raise ValueError(f"not a GGML file (magic {magic:#x})")
    has_version = magic != MAGIC_GGML
    version = u32() if has_version else 0
    if magic == MAGIC_GGJT and not 1 <= version <= 3:
        raise ValueError(f"unsupported ggjt version {version}")

    hp = GgmlHParams(u32(), u32(), u32(), u32(), u32(), u32(), u32())

    vocab: list[tuple[bytes, float]] = []
    for _ in range(hp.n_vocab):
        ln = u32()
        tok = data[off : off + ln]
        off += ln
        score = f32() if has_version else 0.0
        vocab.append((tok, score))

    tensors: dict[str, GgmlTensor] = {}
    while off < len(data):
        n_dims = u32()
        name_len = u32()
        dtype = u32()
        dims = tuple(u32() for _ in range(n_dims))
        name = data[off : off + name_len].decode("utf-8")
        off += name_len
        if magic == MAGIC_GGJT:
            off = (off + 31) & ~31  # 32-byte alignment
        gtype = GGMLType(dtype)
        be, bb = GGML_BLOCK_INFO[gtype]
        n_elems = int(np.prod(dims))
        nbytes = n_elems // be * bb
        raw = np.frombuffer(data, np.uint8, count=nbytes, offset=off).copy()
        off += nbytes
        tensors[name] = GgmlTensor(name=name, dims=dims, gtype=gtype, raw=raw)
    return GgmlContent(hparams=hp, vocab=vocab, tensors=tensors)


def load_ggml_model(path: str, gqa: int = 1, dtype=None):
    """GGML llama checkpoint -> (ModelConfig, DecoderParams, RopeTable).

    gqa: n_head / n_kv_head ratio (the legacy header lacks kv heads —
    ref utils/model_config.rs:19). Tokenizer must be provided externally
    (ref GGMLLoader requires tok_model_id)."""
    import jax.numpy as jnp

    from mistralrs_tpu.models.config import ModelConfig
    from mistralrs_tpu.models.loader import group_layers, make_rope
    from mistralrs_tpu.models.decoder import DecoderParams
    from mistralrs_tpu.quant.gguf_linear import linear_from_gguf
    from mistralrs_tpu.quant import kquants

    dtype = dtype or jnp.bfloat16
    ct = read_ggml(path)
    hp = ct.hparams
    n_kv = hp.n_head // gqa
    head_dim = hp.n_embd // hp.n_head
    # feed-forward size from the first layer tensor (more reliable than n_mult)
    w1 = ct.tensors.get("layers.0.feed_forward.w1.weight")
    n_ff = w1.shape[0] if w1 is not None else hp.n_ff
    cfg = ModelConfig(
        arch="llama", vocab_size=hp.n_vocab, hidden_size=hp.n_embd,
        intermediate_size=n_ff, num_layers=hp.n_layer, num_heads=hp.n_head,
        num_kv_heads=n_kv, head_dim=head_dim, max_position_embeddings=2048,
    )

    def qlin(name):
        t = ct.tensors[name]
        return linear_from_gguf(t.raw, t.gtype, t.shape, dtype)

    def norm(name):
        t = ct.tensors[name]
        return {"w": jnp.asarray(kquants.dequantize(t.raw, t.gtype, t.shape), dtype)}

    layers = []
    for i in range(hp.n_layer):
        p = f"layers.{i}."
        layers.append({
            "attn": {
                "q": qlin(p + "attention.wq.weight"),
                "k": qlin(p + "attention.wk.weight"),
                "v": qlin(p + "attention.wv.weight"),
                "o": qlin(p + "attention.wo.weight"),
            },
            "mlp": {
                "gate": qlin(p + "feed_forward.w1.weight"),
                "up": qlin(p + "feed_forward.w3.weight"),
                "down": qlin(p + "feed_forward.w2.weight"),
            },
            "input_norm": norm(p + "attention_norm.weight"),
            "post_attn_norm": norm(p + "ffn_norm.weight"),
        })
    groups, sizes = group_layers(layers)
    emb = ct.tensors["tok_embeddings.weight"]
    params = DecoderParams(
        embed=jnp.asarray(kquants.dequantize(emb.raw, emb.gtype, emb.shape), dtype),
        layer_groups=groups,
        final_norm=norm("norm.weight"),
        lm_head=qlin("output.weight"),
        group_sizes=sizes,
    )
    return cfg, params, make_rope(cfg)
