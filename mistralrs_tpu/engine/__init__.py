"""Serving runtime: engine, schedulers, sequences, sampling.

Reference parity: mistralrs-core's runtime layer (SURVEY.md §2.1) —
Engine (engine/mod.rs), DefaultScheduler / PagedAttentionScheduler,
BlockEngine (paged_attention/block_engine.rs), Sequence/SequenceGroup
(sequence.rs), Sampler (sampler.rs), PrefixCacheManager (prefix_cacher.rs).

TPU design: the engine drives *jitted step functions* with static-shape
batches (decode batch == cache slot count; prefill chunk lengths bucketed to
powers of two) so continuous batching never triggers recompilation. Sampling
runs on host numpy against reference-ordered semantics, with an on-device
greedy fast path.
"""
