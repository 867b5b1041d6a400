"""GPipe pipeline-parallel prototype on the fake CPU mesh.

Goal: de-risk a TPU-native pipeline-parallel (`pp`) option for the tower
pretraining path before promoting it into `lr2ppo_tpu/parallel/`.

Design under test (the scaling-book circulating-buffer schedule):
  * mesh axis "pp" with S ranks; the L-layer stack is split into S
    contiguous stages whose params are STACKED on a leading axis and
    sharded P("pp") — each rank materializes only its own stage;
  * the batch is split into M microbatches; a `lax.scan` over
    T = M + S - 1 ticks runs the classic GPipe schedule: rank s works
    on microbatch (t - s) when 0 <= t - s < M, then the activations
    `ppermute` one hop down the pp ring;
  * everything lives inside ONE `shard_map`, so XLA overlaps the
    per-tick compute with the ICI hop, and `jax.grad` through the
    scan + ppermute yields the reverse schedule automatically (no
    hand-written backward pipeline);
  * the loss is computed on the LAST rank's collected outputs and
    psum'd, so every rank returns the same scalar.

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python studies/pp_study.py

Success criteria (all asserted below):
  1. forward parity: pipelined logits == plain stacked-scan logits;
  2. grad parity: d(loss)/d(params) matches the unpipelined program
     (reassembled from the pp shards) to float tolerance;
  3. one optimizer step under the pipeline matches the unpipelined step.
"""

import functools
import os

import numpy as np

if __name__ == "__main__":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


# --- a minimal transformer-ish layer: y = gelu(x @ w1) @ w2 + x ---------

def layer_fwd(p, x):
    h = jax.nn.gelu(x @ p["w1"] + p["b1"])
    return h @ p["w2"] + x


def stage_fwd(stage_params, x):
    """Apply this rank's layers (stacked on axis 0) with a scan."""
    def body(h, lp):
        return layer_fwd(lp, h), None
    out, _ = jax.lax.scan(body, x, stage_params)
    return out


def plain_fwd(all_params, x):
    """Reference: the same L layers as one stacked scan (no pipeline)."""
    def body(h, lp):
        return layer_fwd(lp, h), None
    out, _ = jax.lax.scan(body, x, all_params)
    return out


def make_pipeline(mesh, S, M, micro_shape, with_dp=False):
    """Returns pipe(params_stacked, x_micro) -> y_micro, shard_mapped
    over the pp axis. params_stacked: [S, layers_per_stage, ...] sharded
    P('pp'); x_micro: [M, mb, d] replicated (or rows over dp when
    with_dp); returns [M, mb, d]."""

    def body(stage_params, x_micro):
        # stage_params arrives with the sharded leading axis of size 1
        stage_params = jax.tree.map(lambda a: a[0], stage_params)
        idx = jax.lax.axis_index("pp")
        mb, d = x_micro.shape[1], x_micro.shape[2]
        T = M + S - 1

        def tick(carry, t):
            buf, outputs = carry
            # rank 0 injects microbatch t (if any) — other ranks use the
            # activation that just arrived from the previous rank
            inject = jnp.where(t < M, t, M - 1)
            x_in = jnp.where(idx == 0, x_micro[inject], buf)
            active = (t - idx >= 0) & (t - idx < M)
            y = stage_fwd(stage_params, x_in)
            y = jnp.where(active, y, x_in)
            # the LAST rank collects finished microbatch (t - (S-1))
            out_slot = jnp.where(t - (S - 1) >= 0, t - (S - 1), 0)
            collect = (idx == S - 1) & (t - (S - 1) >= 0)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs,
                jnp.where(collect, y, outputs[out_slot]),
                out_slot, 0)
            # hop down the ring: rank s -> s+1 (last rank's send wraps
            # to rank 0, which ignores it)
            buf = jax.lax.ppermute(
                y, "pp", [(i, (i + 1) % S) for i in range(S)])
            return (buf, outputs), None

        buf0 = jnp.zeros((mb, d), x_micro.dtype)
        outs0 = jnp.zeros((M, mb, d), x_micro.dtype)
        (buf, outputs), _ = jax.lax.scan(tick, (buf0, outs0),
                                         jnp.arange(T))
        # only the last rank holds real outputs; broadcast them so every
        # rank returns the same value (psum of a one-hot contribution)
        outputs = jnp.where(idx == S - 1, outputs, 0.0)
        outputs = jax.lax.psum(outputs, "pp")
        return outputs

    # with dp in the mesh: params replicate over dp (spec omits it), the
    # microbatch rows shard over dp — each (dp, pp) shard pipelines its
    # own rows; autodiff inserts the psum over dp for the param grads
    xspec = P(None, "dp") if with_dp else P()
    return shard_map(
        body, mesh=mesh,
        in_specs=(P("pp"), xspec),
        out_specs=xspec,
        check_vma=False)


def main():
    S, layers_per_stage, M = 4, 2, 4
    L = S * layers_per_stage
    d, mb = 16, 8
    B = M * mb
    mesh = Mesh(np.asarray(jax.devices()[:S]), ("pp",))

    rng = np.random.default_rng(0)
    def mk_layer():
        return {"w1": rng.standard_normal((d, 4 * d)).astype(np.float32)
                * 0.05,
                "b1": np.zeros((4 * d,), np.float32),
                "w2": rng.standard_normal((4 * d, d)).astype(np.float32)
                * 0.05}
    layers = [mk_layer() for _ in range(L)]
    # [L, ...] stacked for the plain reference; [S, lps, ...] for pp
    all_params = jax.tree.map(lambda *a: jnp.stack(a), *layers)
    pp_params = jax.tree.map(
        lambda a: a.reshape((S, layers_per_stage) + a.shape[1:]),
        all_params)
    pp_params = jax.device_put(pp_params, NamedSharding(mesh, P("pp")))

    x = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)
    x_micro = x.reshape(M, mb, d)
    tgt = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)
    tgt_micro = tgt.reshape(M, mb, d)

    pipe = make_pipeline(mesh, S, M, (mb, d))

    # ---- 1. forward parity -------------------------------------------
    y_ref = plain_fwd(all_params, x)
    y_pp = jax.jit(pipe)(pp_params, x_micro).reshape(B, d)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    print("forward parity OK", float(jnp.abs(y_pp - y_ref).max()))

    # ---- 2. grad parity ----------------------------------------------
    def loss_pp(params):
        out = pipe(params, x_micro)
        return jnp.mean((out - tgt_micro) ** 2)

    def loss_ref(params):
        out = plain_fwd(params, x)
        return jnp.mean((out - tgt) ** 2)

    l_pp, g_pp = jax.jit(jax.value_and_grad(loss_pp))(pp_params)
    l_ref, g_ref = jax.jit(jax.value_and_grad(loss_ref))(all_params)
    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-6)
    g_pp_host = jax.tree.map(
        lambda a: np.asarray(a).reshape((L,) + a.shape[2:]), g_pp)
    for k in ("w1", "b1", "w2"):
        np.testing.assert_allclose(g_pp_host[k], np.asarray(g_ref[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    print("grad parity OK", float(l_pp))

    # ---- 3. one optimizer step ---------------------------------------
    import optax

    tx = optax.adamw(1e-3)
    st_pp = jax.jit(tx.init)(pp_params)
    st_ref = jax.jit(tx.init)(all_params)

    @jax.jit
    def step_pp(params, st):
        g = jax.grad(loss_pp)(params)
        upd, st = tx.update(g, st, params)
        return optax.apply_updates(params, upd), st

    @jax.jit
    def step_ref(params, st):
        g = jax.grad(loss_ref)(params)
        upd, st = tx.update(g, st, params)
        return optax.apply_updates(params, upd), st

    new_pp, _ = step_pp(pp_params, st_pp)
    new_ref, _ = step_ref(all_params, st_ref)
    for k in ("w1", "b1", "w2"):
        got = np.asarray(new_pp[k]).reshape((L,) + new_pp[k].shape[2:])
        np.testing.assert_allclose(got, np.asarray(new_ref[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    # params must still be pp-sharded after the step
    assert "pp" in tuple(new_pp["w1"].sharding.spec), \
        new_pp["w1"].sharding
    print("optimizer-step parity OK; params stayed pp-sharded")

    # ---- 4. dp x pp composition --------------------------------------
    mesh2 = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "pp"))
    pp2 = jax.device_put(
        jax.tree.map(
            lambda a: a.reshape((S, layers_per_stage) + a.shape[1:]),
            all_params),
        NamedSharding(mesh2, P("pp")))
    pipe2 = make_pipeline(mesh2, S, M, (mb, d), with_dp=True)
    xm2 = jax.device_put(x_micro, NamedSharding(mesh2, P(None, "dp")))
    tm2 = jax.device_put(tgt_micro, NamedSharding(mesh2, P(None, "dp")))

    def loss_pp2(params):
        out = pipe2(params, xm2)
        return jnp.mean((out - tm2) ** 2)

    l2, g2 = jax.jit(jax.value_and_grad(loss_pp2))(pp2)
    np.testing.assert_allclose(float(l2), float(l_ref), rtol=1e-6)
    g2_host = jax.tree.map(
        lambda a: np.asarray(a).reshape((L,) + a.shape[2:]), g2)
    for k in ("w1", "b1", "w2"):
        np.testing.assert_allclose(g2_host[k], np.asarray(g_ref[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    print("dp x pp grad parity OK (param grads psum over dp)")


if __name__ == "__main__":
    main()
