"""Forward throughput of the flat model families (CMA, Seq2Seq) at paper
configuration sizes — breadth companion to bench.py's HCM numbers.

Usage: python benchmarks/variants.py {cma,seq2seq}   (one process per variant:
the remote-compile service serves ~one model-sized compile per process).
Same method as bench.py: host-CPU param init, params as jit args, single big
compile, trivial-call overhead subtraction.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(kind: str, batch=4, t=50, reps=7):
    import jax
    import jax.numpy as jnp

    from robo_vln_tpu.config.default import get_config
    from robo_vln_tpu.models import build_flat_policy

    yaml = {
        "cma": "robo_vln_tpu/config/configs/cma_robo.yaml",
        "seq2seq": "robo_vln_tpu/config/configs/seq2seq_robo.yaml",
    }[kind]
    cfg = get_config(os.path.join(REPO, yaml)).clone().defrost()
    cfg.MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings = False
    cfg.freeze()

    policy = build_flat_policy(cfg.MODEL, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    obs = {
        "rgb": jnp.asarray(rng.integers(0, 255, (batch, t, 224, 224, 3)), jnp.float32),
        "depth": jnp.asarray(rng.random((batch, t, 256, 256, 1)), jnp.float32),
        "instruction": jnp.asarray(rng.integers(1, 1000, (batch, 200)), jnp.int32),
        "progress": jnp.asarray(rng.random((batch, t)), jnp.float32),
    }
    masks = jnp.ones((batch, t), jnp.float32).at[:, 0].set(0.0)
    prev = jnp.zeros((batch, t, 2), jnp.float32)
    hidden = policy.initial_hidden(batch)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        obs_h = jax.tree.map(lambda x: jax.device_put(x, cpu), obs)
        variables = jax.jit(policy.init)(
            jax.random.PRNGKey(0), obs_h, hidden, prev, masks
        )
    default = jax.devices()[0]
    if default != cpu:
        variables = jax.device_put(variables, default)

    @jax.jit
    def fwd(variables, obs, hidden, prev, masks):
        actions, stop, hid, _ = policy.apply(variables, obs, hidden, prev, masks)
        return jnp.mean(actions.astype(jnp.float32))

    @jax.jit
    def trivial(m):
        return jnp.mean(m)

    args = (variables, obs, hidden, prev, masks)
    float(fwd(*args))  # the ONE model-sized compile
    float(trivial(masks))

    def timed(fn, xs):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_fwd = timed(fwd, args)
    t_0 = timed(trivial, (masks,))
    per_frame = max(t_fwd - t_0, 1e-9) / (batch * t)
    print(json.dumps({"variant": kind, "forward_fps": round(1.0 / per_frame, 1)}))


if __name__ == "__main__":
    measure(sys.argv[1] if len(sys.argv) > 1 else "cma")
