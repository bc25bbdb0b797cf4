"""Multi-PROCESS dryrun (VERDICT r4 item 5): exercise
``parallel/distributed.initialize`` for real — 2 localhost processes x 4
virtual CPU devices each, one global ("data", "model") = (2, 4) mesh whose
data axis crosses the PROCESS boundary (the DCN stand-in), TP x DP serving
step (prefill + sampled decode, the __graft_entry__ dryrun body) jit'd over
the global mesh — and assert the tokens/logits equal the single-process
8-device run of the same step.

This is the one parallelism entry point no in-process test could execute:
jax.distributed's coordinator/client handshake, cross-process collectives,
and make_multihost_mesh's process-major device order.

Usage:
  python scripts/dryrun_multiprocess.py           # parent: spawns 2 workers
  python scripts/dryrun_multiprocess.py --worker I PORT   # internal
"""

import json
import os
import subprocess
import sys

import numpy as np

# self-sufficient import path: the parent AND the spawned workers must find
# the package whether or not the caller exported PYTHONPATH (the test-suite
# runner invokes this script as a bare subprocess)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get(
    "PYTHONPATH", "")

N_PROC, LOCAL_DEV = 2, 4


def _build(n_model):
    """Tiny llama + the TP x DP serving step (same body as
    __graft_entry__.dryrun_multichip's first phase)."""
    import jax
    import jax.numpy as jnp

    from tinychatengine_tpu.core.config import (GenerationConfig, ModelConfig,
                                                QuantConfig)
    from tinychatengine_tpu.generation import kv_cache as kvc
    from tinychatengine_tpu.generation import sampling
    from tinychatengine_tpu.generation.engine import _hashable_gcfg
    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.parallel.tp import make_tp_forward

    cfg = ModelConfig(
        name="dryrun", family="llama", num_heads=8, num_kv_heads=4,
        num_layers=2, max_sqlen=32, embed_dim=1024, hidden_dim=1024,
        vocab_size=512, rms_norm_eps=1e-5)
    qcfg = QuantConfig(scheme="w4a16")
    params = llama.init_random_params(cfg, qcfg, seed=0, tp_degree=n_model)
    cache = kvc.init_cache(cfg.num_layers, N_PROC, cfg.max_sqlen,
                           cfg.num_kv_heads, cfg.head_dim)

    def serving_step_of(mesh):
        tp_forward = make_tp_forward(mesh)

        @jax.jit
        def serving_step(params, ids, cache, key):
            logits, cache = tp_forward(params, cfg, ids, cache, jnp.int32(0))
            state = sampling.SamplerState(
                key=key, mu=jnp.full((ids.shape[0],), 10.0))
            tok, _ = sampling.sample(
                logits, state, _hashable_gcfg(GenerationConfig(temp=0.7)))
            logits2, cache = tp_forward(params, cfg, tok[:, None], cache,
                                        jnp.asarray(ids.shape[1], jnp.int32))
            return tok, logits2

        return serving_step

    ids = np.tile(np.arange(1, 9, dtype=np.int32), (N_PROC, 1))
    return cfg, params, cache, ids, serving_step_of


def worker(proc_id: int, port: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", LOCAL_DEV)

    from tinychatengine_tpu.parallel import distributed
    distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=N_PROC, process_id=proc_id)
    info = distributed.process_info()
    assert info["process_count"] == N_PROC, info
    assert info["global_devices"] == N_PROC * LOCAL_DEV, info

    import jax.numpy as jnp  # noqa: F401
    from jax.experimental import multihost_utils

    from tinychatengine_tpu.parallel.sharding import shard_cache, shard_params

    mesh = distributed.make_multihost_mesh(n_model=LOCAL_DEV)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
        {"data": N_PROC, "model": LOCAL_DEV}
    # each model (TP) group must sit inside ONE process: ICI within the
    # host, DCN only on the data axis
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1, mesh.devices

    cfg, params, cache, ids, step_of = _build(LOCAL_DEV)
    params = shard_params(params, mesh)
    cache = shard_cache(cache, mesh)
    tok, logits2 = step_of(mesh)(params, jnp.asarray(ids), cache,
                                 jax.random.PRNGKey(0))
    tok = multihost_utils.process_allgather(tok, tiled=True)
    logits2 = multihost_utils.process_allgather(logits2, tiled=True)
    if proc_id == 0:
        print(json.dumps({"tok": np.asarray(tok).reshape(-1).tolist(),
                          "logits_l1": float(np.abs(logits2).mean())}))


def parent():
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i),
         str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(N_PROC)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (o, e) in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{e[-3000:]}")
    got = json.loads(outs[0][0].strip().splitlines()[-1])

    # single-process oracle: same step on an 8-device local mesh
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", N_PROC * LOCAL_DEV)
    import jax.numpy as jnp

    from tinychatengine_tpu.parallel.sharding import (make_mesh, shard_cache,
                                                      shard_params)
    cfg, params, cache, ids, step_of = _build(LOCAL_DEV)
    mesh = make_mesh(n_data=N_PROC, n_model=LOCAL_DEV)
    tok, logits2 = step_of(mesh)(shard_params(params, mesh),
                                 jnp.asarray(ids), shard_cache(cache, mesh),
                                 jax.random.PRNGKey(0))
    want_tok = np.asarray(tok).reshape(-1).tolist()
    want_l1 = float(np.abs(np.asarray(logits2)).mean())

    assert got["tok"] == want_tok, (got["tok"], want_tok)
    assert abs(got["logits_l1"] - want_l1) < 1e-4 * max(abs(want_l1), 1.0), \
        (got["logits_l1"], want_l1)
    print(json.dumps({
        "metric": "multiprocess_dryrun", "ok": True,
        "processes": N_PROC, "local_devices": LOCAL_DEV,
        "tokens": want_tok}))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
    else:
        parent()
