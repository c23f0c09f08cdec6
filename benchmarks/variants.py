"""Forward/train throughput of the flat model families (CMA, Seq2Seq) at
paper configuration sizes — breadth companion to bench.py's HCM numbers.

Usage: python benchmarks/variants.py {cma,seq2seq} [--train]
(one process per variant+mode: the remote-compile service serves ~one
model-sized compile per process).  Same method as bench.py: host-CPU param
init, params as jit args, single big compile, trivial-call overhead
subtraction.  --train measures the full IL train step (grads + masked Adam
+ live dropout via the hardware-RNG key, training/steps.py)."""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(kind: str, batch=4, t=50, reps=7, train=False):
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
    def trivial(m):
        return jnp.mean(m)

    def timed(fn, xs):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    if train:
        from robo_vln_tpu.training import optimizers as opt_lib
        from robo_vln_tpu.training import steps as steps_lib

        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}

        class _B:
            def apply(self, vrs, *a, **kw):
                return policy.apply({**extra, **vrs}, *a, **kw)

        tx = opt_lib.masked(opt_lib.adam(), params)
        state = steps_lib.TrainState(params, tx.init(params), jnp.asarray(0))
        use_pm = cfg.MODEL.PROGRESS_MONITOR.use
        step = steps_lib.make_flat_train_step(
            _B(), tx, None, use_progress=use_pm,
            progress_alpha=cfg.MODEL.PROGRESS_MONITOR.alpha, donate=False,
        )
        rng = np.random.default_rng(1)
        batch_data = {
            **obs,
            "prev_actions": prev,
            "corrected_actions": jnp.asarray(
                rng.random((batch, t, 2)), jnp.float32
            ),
            "oracle_stop": jnp.asarray(
                (rng.random((batch, t, 1)) > 0.7).astype(np.float32)
            ),
            "not_done_masks": masks,
            "valid_mask": jnp.ones((batch, t), jnp.float32),
        }

        def run(state, hidden):
            s2, h2, metrics = step(state, hidden, batch_data, 1e-4)
            return s2, h2, metrics["total_loss"]

        state, h2, loss = run(state, hidden)  # the ONE model-sized compile
        float(loss)
        float(trivial(masks))

        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            state, h2, loss = run(state, h2)
            float(loss)
            ts.append(time.perf_counter() - t0)
        t_step = min(ts)
        t_0 = timed(trivial, (masks,))
        per_frame = max(t_step - t_0, 1e-9) / (batch * t)
        print(json.dumps({"variant": kind,
                          "train_fps": round(1.0 / per_frame, 1)}))
        return

    @jax.jit
    def fwd(variables, obs, hidden, prev, masks):
        actions, stop, hid, _ = policy.apply(variables, obs, hidden, prev, masks)
        return jnp.mean(actions.astype(jnp.float32))

    args = (variables, obs, hidden, prev, masks)
    float(fwd(*args))  # the ONE model-sized compile
    float(trivial(masks))

    t_fwd = timed(fwd, args)
    t_0 = timed(trivial, (masks,))
    per_frame = max(t_fwd - t_0, 1e-9) / (batch * t)
    print(json.dumps({"variant": kind, "forward_fps": round(1.0 / per_frame, 1)}))


if __name__ == "__main__":
    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    measure(positional[0] if positional else "cma",
            train="--train" in sys.argv)
