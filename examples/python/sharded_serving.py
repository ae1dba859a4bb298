"""Multi-chip serving over a dp x sp x tp mesh (SURVEY §2.4: the genuinely
new layer vs the single-GPU reference). TP shards every projection + the
paged KV head axis; sp>1 additionally runs long first prefill chunks as
sequence-sharded ring attention. Run with real chips, or simulate:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python sharded_serving.py <model-dir>
"""
import sys

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.parallel.mesh import make_mesh

mesh = make_mesh(dp=1, sp=1, tp=None)  # tp = all devices
runner = Runner(sys.argv[1], mesh=mesh)
r = runner.send_chat_completion_request(
    [{"role": "user", "content": "Why do TPUs like static shapes?"}],
    SamplingParams(max_len=64),
)
print(r.choices[0].text)
