"""AnyMoE — build a sparse MoE from dense models, with gate pre-training.

Reference parity: mistralrs-core/src/amoe/ (`MoeMlp`/`MoeGate` mod.rs:160-186,
`AnyMoeConfig` :142) + pipeline/amoe.rs (`AnyMoePipeline`, `amoe_pre_train`
:267 with AdamW :336-341): selected decoder layers' MLPs are replaced by a
mixture over expert MLPs taken from other checkpoints (fine-tuned models or
LoRA-delta experts); a small gate is trained on a labeled (prompt -> expert)
dataset while all model weights stay frozen — the reference caches the
gating inputs during a forward pass and optimizes only the gate, which is
what we do here with optax.

Device formulation: expert MLP weights are stacked on a leading [n_experts]
axis inside the layer params (one einsum over experts, like the mixtral
path), and the gate is a tiny dense linear; converted layers form their own
scan group automatically (structure-keyed grouping).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from mistralrs_tpu.models.config import ModelConfig
from mistralrs_tpu.models.decoder import DecoderParams, _norm
from mistralrs_tpu.lora.lora import unstack_groups
from mistralrs_tpu.ops import layers as L
from mistralrs_tpu.quant.qlinear import Linear, linear, make_dense


@dataclasses.dataclass
class AnyMoeConfig:
    """Ref amoe/mod.rs AnyMoeConfig (:142)."""

    hidden_size: int = 0  # filled from the model
    lr: float = 1e-3
    epochs: int = 100
    batch_size: int = 4
    expert_type: str = "fine_tuned"  # or "lora_adapter"
    gate_model_id: str | None = None  # save/load path for gate.safetensors
    training: bool = True
    layers: list[int] | None = None  # which decoder layers get the MoE (None=all)


# ------------------------------------------------------------- conversion
def _mlp_tree(layer_mlp: dict) -> dict:
    """Extract dense (in,out) weight arrays from a layer's mlp params."""
    out = {}
    for k, v in layer_mlp.items():
        if isinstance(v, Linear):
            assert v.kind == "dense", "AnyMoE experts must be unquantized"
            out[k] = v.data["w"]
    return out


def convert_to_anymoe(
    params: DecoderParams,
    cfg: ModelConfig,
    expert_params: list[DecoderParams],
    amoe: AnyMoeConfig,
    rng: np.random.Generator | None = None,
) -> DecoderParams:
    """Replace selected layers' MLPs with a mixture over
    [base, *expert_params] MLPs and a fresh gate (ref AnyMoeLoader)."""
    assert not cfg.is_moe, "cannot AnyMoE-convert a model that is already MoE"
    rng = rng or np.random.default_rng(0)
    base_layers = unstack_groups(params)
    experts_layers = [unstack_groups(p) for p in expert_params]
    target = set(amoe.layers if amoe.layers is not None else range(cfg.num_layers))
    n_experts = 1 + len(expert_params)
    H = cfg.hidden_size

    new_layers = []
    for i, lp in enumerate(base_layers):
        lp = jax.tree.map(lambda x: x, lp)  # structural copy
        if i not in target:
            new_layers.append(lp)
            continue
        towers = [_mlp_tree(lp["mlp"])] + [_mlp_tree(el[i]["mlp"]) for el in experts_layers]
        stacked = {
            k: jnp.stack([t[k] for t in towers]) for k in towers[0]
        }  # each [n, in, out]
        gate_w = jnp.asarray(
            (rng.standard_normal((H, n_experts)) * 0.02).astype(np.float32),
            params.embed.dtype,
        )
        lp["mlp"] = {
            "anymoe": {
                "gate": make_dense(gate_w),
                "experts": stacked,
            }
        }
        new_layers.append(lp)

    from mistralrs_tpu.models.loader import group_layers

    groups, sizes = group_layers(new_layers)
    return dataclasses.replace(params, layer_groups=groups, group_sizes=sizes)


def convert_to_anymoe_lora(
    params: DecoderParams,
    cfg: ModelConfig,
    adapters: list,  # list[LoraAdapter] targeting mlp projections
    amoe: AnyMoeConfig,
    rng: np.random.Generator | None = None,
) -> DecoderParams:
    """LoRA-adapter experts (ref AnyMoeExpertType::LoraAdapter mod.rs:134):
    each expert is base_mlp + (alpha/r)*A@B per targeted projection. The
    adapters are frozen during gate pre-training (only gates get gradients,
    ref amoe_base_model_trainable_params), so merging the delta into a dense
    expert tower is numerically identical to runtime LoRA compute — and one
    stacked einsum instead of E extra matmuls per layer on the MXU."""
    # PEFT target-module names -> our mlp param keys (loader.py layer dicts)
    key_map = {"gate_proj": "gate", "up_proj": "up", "down_proj": "down",
               "fc1": "fc1", "fc2": "fc2", "c_fc": "fc1", "c_proj": "fc2"}
    expert_params = []
    base_layers = unstack_groups(params)
    for ad in adapters:
        scale = ad.alpha / ad.r
        elayers = []
        for i, lp in enumerate(base_layers):
            lp = jax.tree.map(lambda x: x, lp)
            mlp = dict(lp["mlp"])
            for key, (A, B) in ad.weights.items():
                layer_s, proj = key.split(".", 1)
                if int(layer_s) != i or proj not in key_map:
                    continue
                k = key_map[proj]
                base_lin: Linear = mlp[k]
                assert base_lin.kind == "dense", "AnyMoE experts must be unquantized"
                # torch layout A [r, in], B [out, r] -> delta_t [in, out]
                delta = (np.asarray(A).T @ np.asarray(B).T) * scale
                w = base_lin.data["w"] + jnp.asarray(delta, base_lin.data["w"].dtype)
                mlp[k] = make_dense(w, base_lin.data.get("b"))
            lp["mlp"] = mlp
            elayers.append(lp)
        from mistralrs_tpu.models.loader import group_layers

        groups, sizes = group_layers(elayers)
        expert_params.append(dataclasses.replace(
            params, layer_groups=groups, group_sizes=sizes))
    return convert_to_anymoe(params, cfg, expert_params, amoe, rng=rng)


from mistralrs_tpu.models.decoder import _anymoe_mlp as anymoe_mlp  # noqa: E402


# ------------------------------------------------------------- gate training
def collect_gating_inputs(
    params: DecoderParams,
    cfg: ModelConfig,
    rope,
    token_batches: list[list[int]],
) -> list[np.ndarray]:
    """Run the model over the dataset prompts, capturing each converted
    layer's MLP input (post-attention-norm hidden states) — the reference
    caches these during forward (pipeline/amoe.rs get_cached_gating_outputs).

    Returns per-converted-layer arrays [n_tokens_total, H]."""
    assert cfg.block_style == "prenorm", "AnyMoE training supports prenorm blocks"
    from mistralrs_tpu.models.decoder import _attention
    from mistralrs_tpu.ops import attention as attn_ops
    from mistralrs_tpu.ops.kv_cache import AttnMeta, KVCache

    layers = unstack_groups(params)
    captured: dict[int, list[np.ndarray]] = {
        i: [] for i, lp in enumerate(layers) if "anymoe" in lp["mlp"]
    }

    for toks in token_batches:
        ids = jnp.asarray(np.asarray(toks, np.int32)[None])
        B, T = ids.shape
        cache = KVCache.create(cfg.num_layers, B, T, cfg.num_kv_heads, cfg.head_dim,
                               jnp.float32)
        meta = AttnMeta(
            positions=jnp.arange(T, dtype=jnp.int32)[None],
            kv_lens=jnp.asarray([T], jnp.int32),
            write_pos=jnp.zeros((B,), jnp.int32),
            active=jnp.ones((B,), jnp.float32),
        )
        h = jnp.take(params.embed, ids, axis=0)
        if cfg.embed_scale != 1.0:
            h = h * jnp.asarray(cfg.embed_scale, h.dtype)
        cos, sin = rope.gather(meta.positions)
        bias = attn_ops.causal_mask_bias(T, T, q_offsets=meta.kv_lens - T)
        for i, lp in enumerate(layers):
            x = _norm(cfg, lp["input_norm"], h)
            attn_out, _, _ = _attention(
                cfg, lp["attn"], x, cos, sin, rope.rot_dim,
                cache.k[i], cache.v[i], meta, bias,
            )
            h = h + attn_out
            x_mlp = _norm(cfg, lp["post_attn_norm"], h)
            if i in captured:
                captured[i].append(np.asarray(x_mlp[0], np.float32))
                mlp_out = anymoe_mlp(cfg, lp["mlp"], x_mlp)
            else:
                from mistralrs_tpu.models.decoder import _mlp

                mlp_out = _mlp(cfg, lp["mlp"], x_mlp)
            h = h + mlp_out
    return {i: np.concatenate(v, axis=0) for i, v in captured.items()}


def pretrain_gates(
    params: DecoderParams,
    cfg: ModelConfig,
    rope,
    dataset: list[tuple[list[int], int]],  # (prompt tokens, expert index)
    amoe: AnyMoeConfig,
) -> DecoderParams:
    """Train only the gates with AdamW (ref amoe_pre_train :267, optimizer
    :336-341): cross-entropy from each converted layer's mean-pooled gate
    logits to the labeled expert."""
    import optax

    inputs = collect_gating_inputs(params, cfg, rope, [t for t, _ in dataset])
    # per-sample pooled activations per layer
    layer_ids = sorted(inputs)
    lengths = [len(t) for t, _ in dataset]
    labels = jnp.asarray([e for _, e in dataset], jnp.int32)
    pooled = {}
    for li in layer_ids:
        arr = inputs[li]
        offs = np.cumsum([0] + lengths)
        pooled[li] = jnp.asarray(
            np.stack([arr[offs[j] : offs[j + 1]].mean(0) for j in range(len(dataset))])
        )  # [n_samples, H]

    layers = unstack_groups(params)
    gates = {li: layers[li]["mlp"]["anymoe"]["gate"].data["w"] for li in layer_ids}

    def loss_fn(gs):
        total = 0.0
        for li in layer_ids:
            logits = pooled[li] @ gs[li].astype(jnp.float32)  # [n, n_experts]
            total = total + optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
        return total / len(layer_ids)

    opt = optax.adamw(amoe.lr)
    state = opt.init(gates)

    @jax.jit
    def step(gs, st):
        loss, grads = jax.value_and_grad(loss_fn)(gs)
        updates, st = opt.update(grads, st, gs)
        return optax.apply_updates(gs, updates), st, loss

    for _ in range(amoe.epochs):
        gates, state, loss = step(gates, state)

    for li in layer_ids:
        layers[li]["mlp"]["anymoe"]["gate"] = make_dense(
            gates[li].astype(params.embed.dtype)
        )
    from mistralrs_tpu.models.loader import group_layers

    groups, sizes = group_layers(layers)
    if amoe.gate_model_id:
        save_gates(amoe.gate_model_id, {li: np.asarray(gates[li]) for li in layer_ids})
    return dataclasses.replace(params, layer_groups=groups, group_sizes=sizes)


# ------------------------------------------------------------- persistence
def save_gates(path: str, gates: dict[int, np.ndarray]) -> None:
    """gate.safetensors writer (ref amoe/mod.rs:32-55)."""
    import os

    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    save_file(
        # ascontiguousarray: safetensors' numpy writer serializes raw bytes
        # and silently corrupts non-C-ordered arrays
        {f"layers.{li}.gate.weight": np.ascontiguousarray(g) for li, g in gates.items()},
        os.path.join(path, "gate.safetensors"),
    )


def load_gates(path: str, params: DecoderParams) -> DecoderParams:
    """Reload pre-trained gates (ref normal.rs:600-641)."""
    import os
    import re

    from safetensors import safe_open

    layers = unstack_groups(params)
    with safe_open(os.path.join(path, "gate.safetensors"), framework="np") as h:
        for key in h.keys():
            m = re.match(r"layers\.(\d+)\.gate\.weight", key)
            if m:
                li = int(m.group(1))
                layers[li]["mlp"]["anymoe"]["gate"] = make_dense(
                    jnp.asarray(h.get_tensor(key), params.embed.dtype)
                )
    from mistralrs_tpu.models.loader import group_layers

    groups, sizes = group_layers(layers)
    return dataclasses.replace(params, layer_groups=groups, group_sizes=sizes)
