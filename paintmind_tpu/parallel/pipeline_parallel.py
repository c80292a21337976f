"""GPipe-style pipeline parallelism over the mesh 'model' axis.

The reference has no pipeline parallelism (SURVEY §2.2: its entire
distributed story is DDP via accelerate, reference utils/trainer.py:85-90);
this is a TPU-native extension for variants too deep for one chip's HBM.

Design — the depth-stacked parameter layout (nn/transformer.init_stack:
every leaf carries a leading ``depth`` axis) makes stage assignment a plain
sharding: partition the depth axis over the ``model`` mesh axis and each
device holds ``depth/S`` contiguous layers.  Execution is a ``shard_map``
whose body runs the classic GPipe schedule as one ``lax.scan``:

  * the per-device batch is split into M microbatches;
  * at tick t, stage s runs its local layer stack on microbatch ``t-s``;
  * activations (and their conditioning context, which must travel with
    its microbatch) rotate stage→stage+1 through ``lax.ppermute`` — a
    nearest-neighbour ICI hop, the cheapest collective on a TPU torus;
  * the last stage's outputs are valid from tick S-1 on; a masked ``psum``
    over the pipe axis replicates them (only one stage contributes).

Total ticks T = M + S - 1; bubble fraction (S-1)/T shrinks as M grows.
``lax.ppermute`` is differentiable (its transpose is the reverse
permutation), so ``jax.grad`` through ``pp_stack_apply`` yields the exact
backward pipeline schedule — the same shard_map'd program trains.

Composition: the 'data' axis keeps pure data parallelism outside the
shard_map body, so a (data=2, model=4) mesh runs 2-way DP over 4-stage
pipelines.  Inside the body the Pallas kernels must not re-shard_map
themselves (nesting is invalid), so the stack is traced under
``use_mesh(None)``; the flash kernels still run per-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .context import use_mesh
from .mesh import DATA_AXIS, MODEL_AXIS
from ..nn.transformer import stack_apply


def pp_stack_spec(stacked_params, pipe_axis=MODEL_AXIS):
    """PartitionSpec tree placing each leaf's leading depth axis on the
    pipe axis — stage s of S holds layers [s·depth/S, (s+1)·depth/S)."""
    return jax.tree_util.tree_map(
        lambda x: P(pipe_axis, *([None] * (jnp.ndim(x) - 1))), stacked_params)


def pp_depth(stacked_params):
    return jax.tree_util.tree_leaves(stacked_params)[0].shape[0]


def pp_stack_apply(p, x, context=None, *, mesh, microbatches, heads,
                   dropout_rate=0.0, key=None, deterministic=True,
                   backend=None, remat=False, unroll=1,
                   pipe_axis=MODEL_AXIS, data_axis=DATA_AXIS):
    """Drop-in pipelined alternative to ``nn.transformer.stack_apply``.

    p: depth-stacked block params, sharded (or shardable) with
       :func:`pp_stack_spec` — depth must divide the pipe-axis size.
    x: (B, N, D) hidden state, batch on the data axis; B must divide
       dp × microbatches.
    context: (B, M, Dc) conditioning (travels with its microbatch) or None.

    Returns (B, N, D), bitwise-independent of the number of stages or
    microbatches (each microbatch sees the identical layer sequence; batch
    rows are independent in every sublayer).
    """
    stages = mesh.shape[pipe_axis]
    dp = mesh.shape.get(data_axis, 1)
    depth = pp_depth(p)
    if depth % stages != 0:
        raise ValueError(f'depth {depth} must divide {stages} pipeline stages')
    b, n, d = x.shape
    if b % (dp * microbatches) != 0:
        raise ValueError(f'batch {b} must divide dp={dp} × '
                         f'microbatches={microbatches}')

    has_ctx = context is not None
    p_specs = pp_stack_spec(p, pipe_axis)
    x_spec = P(data_axis, None, None)
    in_specs = (p_specs, x_spec) + ((x_spec,) if has_ctx else ())
    perm = [(i, i + 1) for i in range(stages - 1)]

    def body(p_loc, x_loc, *rest):
        ctx_loc = rest[0] if has_ctx else None
        stage = jax.lax.axis_index(pipe_axis)
        mb = x_loc.shape[0] // microbatches
        ticks = microbatches + stages - 1

        def pad(a):
            a = a.reshape((microbatches, mb) + a.shape[1:])
            z = jnp.zeros((stages - 1,) + a.shape[1:], a.dtype)
            return jnp.concatenate([a, z], axis=0)

        xs = pad(x_loc)
        cs = pad(ctx_loc) if has_ctx else None

        def tick(carry, inp):
            act, cact = carry
            x_t, c_t, t = inp
            cur = jnp.where(stage == 0, x_t, act)
            ctx_cur = jnp.where(stage == 0, c_t, cact) if has_ctx else None
            # decorrelate dropout across microbatches (tick) and stages;
            # layer offsets within a stage come from stack_apply's split
            tick_key = (None if key is None else
                        jax.random.fold_in(jax.random.fold_in(key, t), stage))
            with use_mesh(None):  # kernels must not nest shard_map
                out = stack_apply(p_loc, cur, ctx_cur, heads=heads,
                                  dropout_rate=dropout_rate, key=tick_key,
                                  deterministic=deterministic,
                                  backend=backend, remat=remat, unroll=unroll)
            nxt = jax.lax.ppermute(out, pipe_axis, perm)
            cnxt = (jax.lax.ppermute(ctx_cur, pipe_axis, perm)
                    if has_ctx else cact)
            return (nxt, cnxt), out

        act0 = jnp.zeros_like(xs[0])
        c0 = jnp.zeros_like(cs[0]) if has_ctx else jnp.zeros((), x_loc.dtype)
        inp = (xs, cs if has_ctx else jnp.zeros((ticks,), x_loc.dtype),
               jnp.arange(ticks))
        _, outs = jax.lax.scan(tick, (act0, c0), inp)

        outs = outs[stages - 1:]                       # (M, mb, N, D)
        outs = jnp.where(stage == stages - 1, outs, jnp.zeros_like(outs))
        outs = jax.lax.psum(outs, pipe_axis)           # replicate final-stage
        return outs.reshape((microbatches * mb,) + outs.shape[2:])

    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=x_spec, check_vma=False)
    args = (p, x) + ((context,) if has_ctx else ())
    return fn(*args)


def pp_cond_transformer_param_spec(params, pipe_axis=MODEL_AXIS):
    """PartitionSpec tree for the stage-2 CondTransformer under pipeline
    parallelism: the layer stack's depth axis on the pipe axis, the
    embedding/head params replicated (they run outside the pipelined
    region on every device)."""
    spec = jax.tree_util.tree_map(lambda x: P(), params)
    spec['layers'] = pp_stack_spec(params['layers'], pipe_axis)
    return spec


def pp_cond_transformer_apply(p, x, context=None, *, cfg, mesh, microbatches,
                              key=None, deterministic=True, backend=None,
                              remat=False, pipe_axis=MODEL_AXIS,
                              data_axis=DATA_AXIS, return_hidden=False):
    """Pipelined stage-2 forward: token_proj/pos-embed and the final
    LN/vocab head run replicated (they are a tiny fraction of the FLOPs);
    the 12-layer stack runs through the GPipe schedule.  Matches
    ``models.transformer.cond_transformer_apply`` numerically —
    ``return_hidden`` returns the post-LN hidden state (the CFG sampler
    mixes branch hiddens before the shared vocab head, exactly like the
    dense path)."""
    from ..models.transformer import head_project
    from ..nn.core import layernorm, linear
    from ..nn.moe import is_moe

    layers = p.get('layers')
    if isinstance(layers, dict) and is_moe(layers.get('ffnet')):
        raise NotImplementedError(
            'pipeline parallelism does not support the MoE variant: the '
            'routed ffnet layout (expert capacity per stage) is not '
            'partitionable by the dense GPipe schedule — use expert '
            'parallelism (parallel.mesh.moe_cond_transformer_param_spec) '
            'for paintmindv1-moe instead')

    x = linear(p['token_proj'], x)
    x = x + p['pos_embed'].astype(x.dtype)
    if context is not None and 'context_proj' in p:
        context = linear(p['context_proj'], context.astype(x.dtype))
    elif context is not None:
        context = context.astype(x.dtype)
    x = pp_stack_apply(p['layers'], x, context, mesh=mesh,
                       microbatches=microbatches, heads=cfg.num_head,
                       dropout_rate=cfg.dropout, key=key,
                       deterministic=deterministic, backend=backend,
                       remat=remat, pipe_axis=pipe_axis, data_axis=data_axis)
    x = layernorm(p['norm'], x)
    if return_hidden:
        return x
    return head_project(p, x)


def shard_for_pp(params, mesh, pipe_axis=MODEL_AXIS):
    """Place CondTransformer params for pipeline execution."""
    spec = pp_cond_transformer_param_spec(params, pipe_axis)
    return jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), params, spec)
