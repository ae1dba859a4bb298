"""Multi-host control plane exercised for real: two OS processes form a
jax.distributed CPU cluster (2 local devices each -> 4 global), then run the
serving patterns from parallel/multihost.py — host 0 is primary, step inputs
are broadcast host-0 -> all, and jitted computation runs over the global
mesh (SURVEY §2.4 collective-comm row: host-0 router + per-host workers)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

WORKER_GLUE = textwrap.dedent(
    """
    import os, sys
    import numpy as np

    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from mistralrs_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4  # 2 local x 2 hosts
    assert multihost.is_primary() == (pid == 0)

    # host-0 -> all broadcast of step arrays (engine lives on host 0 only)
    x = {"ids": np.arange(6, dtype=np.int32).reshape(2, 3),
         "kv_lens": np.asarray([7, 9], np.int32)} if pid == 0 else \
        {"ids": np.zeros((2, 3), np.int32), "kv_lens": np.zeros(2, np.int32)}
    got = multihost.broadcast_step_inputs(x)
    np.testing.assert_array_equal(np.asarray(got["ids"]),
                                  np.arange(6, dtype=np.int32).reshape(2, 3))
    np.testing.assert_array_equal(np.asarray(got["kv_lens"]), [7, 9])

    # a jitted collective over the global ("dp","sp","tp") mesh
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = multihost.make_global_mesh(dp=1)
    assert mesh.shape["tp"] == 4
    sh = NamedSharding(mesh, P("tp"))
    glob = jax.make_array_from_process_local_data(
        sh, np.full((2,), pid + 1.0, np.float32), global_shape=(4,))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(glob)
    # process 0 holds [1,1], process 1 holds [2,2] -> global sum 6
    assert float(total) == 6.0, float(total)
    print(f"WORKER-{pid}-OK", flush=True)
    """
)

WORKER_SERVE = textwrap.dedent(
    """
    import os, sys
    import numpy as np

    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from mistralrs_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", num_processes=2, process_id=pid)

    import json, torch, transformers as tf
    import jax.numpy as jnp
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.loader import (
        TensorSource, make_rope, params_from_source,
    )
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    torch.manual_seed(21)
    hf = tf.LlamaConfig(hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=8,
                        num_key_value_heads=4, vocab_size=128,
                        max_position_embeddings=128)
    model = tf.LlamaForCausalLM(hf).eval().float()
    cfg = config_from_hf(json.loads(hf.to_json_string()))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd),
                                dtype=jnp.float32)
    # sp=2 x tp=2 over the GLOBAL mesh: TP collectives AND the ring-attention
    # ppermute (first prefill chunk) cross the process boundary (the DCN hop
    # on a real pod)
    mesh = multihost.make_global_mesh(dp=1, sp=2)
    pipe = TextPipeline(cfg, params, make_rope(cfg),
                        PipelineConfig(page_size=4, num_pages=64, max_seqs=2,
                                       max_model_len=128,
                                       prefill_buckets=(8, 16),
                                       dtype=jnp.float32),
                        mesh=mesh)
    eng = Engine(pipe, eos_token_ids=set())

    # only host 0 "receives the request"; workers get it via broadcast
    prompt0 = (np.random.default_rng(5).integers(3, 120, size=9)
               if pid == 0 else np.zeros(9, np.int64))
    prompt = [int(t) for t in multihost.broadcast_step_inputs(prompt0)]
    got, _ = eng.generate(prompt, SamplingParams(max_len=6))
    with torch.no_grad():
        want = model.generate(torch.tensor([prompt]), max_new_tokens=6,
                              do_sample=False)[0, 9:].tolist()
    assert got == want, (got, want)
    print(f"WORKER-{pid}-OK", flush=True)
    """
)


def _run_cluster(tmp_path, worker_src):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(worker_src)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu itself
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multihost workers hung: {outs}")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER-{i}-OK" in out, out


def test_two_process_cluster(tmp_path):
    """initialize + is_primary + broadcast + global-mesh collective."""
    _run_cluster(tmp_path, WORKER_GLUE)


def test_two_process_engine_serving(tmp_path):
    """The real serving pattern: host 0 sources the request, broadcasts it,
    every host runs the same engine step over a TP mesh that spans both
    processes; greedy tokens match HF on both hosts."""
    _run_cluster(tmp_path, WORKER_SERVE)
