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
from ..nn.moe import moe_stack_apply
from ..nn.transformer import stack_apply


def pp_stack_spec(stacked_params, pipe_axis=MODEL_AXIS):
    """PartitionSpec tree placing each leaf's leading depth axis on the
    pipe axis — stage s of S holds layers [s·depth/S, (s+1)·depth/S)."""
    return jax.tree_util.tree_map(
        lambda x: P(pipe_axis, *([None] * (jnp.ndim(x) - 1))), stacked_params)


def pp_depth(stacked_params):
    return jax.tree_util.tree_leaves(stacked_params)[0].shape[0]


def _gpipe_schedule(p, x, context, *, mesh, microbatches, stage_fn,
                    aux_zero=None, pipe_axis=MODEL_AXIS,
                    data_axis=DATA_AXIS):
    """Shared GPipe machinery behind :func:`pp_stack_apply` (dense) and
    :func:`pp_moe_stack_apply` (routed FFNs).

    ``stage_fn(p_loc, cur, ctx_cur, t, stage)`` runs this stage's local
    layer slice on one microbatch and returns ``(out, aux)`` — ``aux`` is a
    pytree of per-call scalars/vectors (or None).  ``aux_zero`` gives the
    accumulator structure; contributions from warm-up/drain ticks (where a
    stage holds pipeline bubble zeros, not data) are masked out, then the
    accumulator is averaged over stages × microbatches (psum over the pipe
    axis, pmean over the data axis) so the result is replicated and
    comparable to the unpipelined stack's depth-averaged aux.
    """
    stages = mesh.shape[pipe_axis]
    dp = mesh.shape.get(data_axis, 1)
    depth = pp_depth(p)
    if depth % stages != 0:
        raise ValueError(f'depth {depth} must be divisible by {stages} '
                         'pipeline stages')
    b = x.shape[0]
    if b % (dp * microbatches) != 0:
        raise ValueError(f'batch {b} must be divisible by dp={dp} × '
                         f'microbatches={microbatches}')

    has_ctx = context is not None
    has_aux = aux_zero is not None
    p_specs = pp_stack_spec(p, pipe_axis)
    x_spec = P(data_axis, *([None] * (x.ndim - 1)))
    aux_specs = jax.tree_util.tree_map(
        lambda a: P(), aux_zero) if has_aux else None
    in_specs = (p_specs, x_spec) + ((x_spec,) if has_ctx else ())
    out_specs = (x_spec, aux_specs) if has_aux else x_spec
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
            act, cact, aux_acc = carry
            x_t, c_t, t = inp
            cur = jnp.where(stage == 0, x_t, act)
            ctx_cur = jnp.where(stage == 0, c_t, cact) if has_ctx else None
            with use_mesh(None):  # kernels must not nest shard_map
                out, aux = stage_fn(p_loc, cur, ctx_cur, t, stage)
            if has_aux:
                # stage s holds real data (microbatch t-s) only for ticks
                # in [s, s + M); bubble ticks run on zeros and would
                # contaminate the routing statistics
                valid = ((t >= stage) & (t < stage + microbatches)).astype(
                    jnp.float32)
                aux_acc = jax.tree_util.tree_map(
                    lambda acc, a: acc + a.astype(jnp.float32) * valid,
                    aux_acc, aux)
            nxt = jax.lax.ppermute(out, pipe_axis, perm)
            cnxt = (jax.lax.ppermute(ctx_cur, pipe_axis, perm)
                    if has_ctx else cact)
            return (nxt, cnxt, aux_acc), out

        act0 = jnp.zeros_like(xs[0])
        c0 = jnp.zeros_like(cs[0]) if has_ctx else jnp.zeros((), x_loc.dtype)
        aux0 = (jax.tree_util.tree_map(
            lambda a: jnp.zeros(jnp.shape(a), jnp.float32), aux_zero)
            if has_aux else jnp.zeros((), jnp.float32))
        inp = (xs, cs if has_ctx else jnp.zeros((ticks,), x_loc.dtype),
               jnp.arange(ticks))
        (_, _, aux_acc), outs = jax.lax.scan(tick, (act0, c0, aux0), inp)

        outs = outs[stages - 1:]                       # (M, mb, N, D)
        outs = jnp.where(stage == stages - 1, outs, jnp.zeros_like(outs))
        outs = jax.lax.psum(outs, pipe_axis)           # replicate final-stage
        outs = outs.reshape((microbatches * mb,) + outs.shape[2:])
        if not has_aux:
            return outs
        # every stage contributed M masked ticks; average over S·M calls
        # (each call's aux is already that stage's local-depth mean), then
        # over data shards, so the result is replicated
        aux_acc = jax.tree_util.tree_map(
            lambda a: jax.lax.psum(a, pipe_axis) / (stages * microbatches),
            aux_acc)
        if dp > 1:
            aux_acc = jax.tree_util.tree_map(
                lambda a: jax.lax.pmean(a, data_axis), aux_acc)
        return outs, aux_acc

    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    args = (p, x) + ((context,) if has_ctx else ())
    return fn(*args)


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
    def stage_fn(p_loc, cur, ctx_cur, t, stage):
        # decorrelate dropout across microbatches (tick) and stages;
        # layer offsets within a stage come from stack_apply's split
        tick_key = (None if key is None else
                    jax.random.fold_in(jax.random.fold_in(key, t), stage))
        out = stack_apply(p_loc, cur, ctx_cur, heads=heads,
                          dropout_rate=dropout_rate, key=tick_key,
                          deterministic=deterministic,
                          backend=backend, remat=remat, unroll=unroll)
        return out, None

    return _gpipe_schedule(p, x, context, mesh=mesh,
                           microbatches=microbatches, stage_fn=stage_fn,
                           pipe_axis=pipe_axis, data_axis=data_axis)


def pp_moe_stack_apply(p, x, context=None, *, mesh, microbatches, heads,
                       num_selected=2, capacity_factor=1.25,
                       dropout_rate=0.0, key=None, deterministic=True,
                       backend=None, remat=False,
                       pipe_axis=MODEL_AXIS, data_axis=DATA_AXIS):
    """Pipelined alternative to ``nn.moe.moe_stack_apply`` — PP × MoE
    composition (VERDICT r4 #6).

    Stage assignment is identical to the dense case: MoE leaves are
    (depth, E, ...), so partitioning the leading depth axis over the pipe
    axis gives each stage ``depth/S`` layers with their FULL expert pools
    local — pipeline parallelism divides the 2.4×-dense MoE parameter
    footprint by S, which is exactly the HBM relief PP exists for.  Expert
    parallelism (sharding E itself) is the alternative use of the same
    mesh axis — see DESIGN.md for when to pick which; combining both would
    need a third mesh axis.

    Routing is per-microbatch: each expert's capacity is computed from the
    microbatch's token count (``C = ceil(mb·N·k/E · cf)``), so routing
    pressure matches grad-accum microbatching semantics rather than the
    full-batch run.  With no capacity drops the combined output is exactly
    grouping-invariant (each token's output is its gate-weighted expert
    mix); the returned aux is the mean over stages × microbatches of the
    per-call Switch statistics.

    Returns (x, aux) like ``moe_stack_apply``.
    """
    aux_zero = {'lb_loss': 0.0, 'router_z': 0.0, 'dropped': 0.0,
                'expert_load': jnp.zeros(
                    (jax.tree_util.tree_leaves(
                        p['ffnet']['experts'])[0].shape[1],), jnp.float32)}

    def stage_fn(p_loc, cur, ctx_cur, t, stage):
        tick_key = (None if key is None else
                    jax.random.fold_in(jax.random.fold_in(key, t), stage))
        return moe_stack_apply(p_loc, cur, ctx_cur, heads=heads,
                               num_selected=num_selected,
                               capacity_factor=capacity_factor,
                               dropout_rate=dropout_rate, key=tick_key,
                               deterministic=deterministic, backend=backend,
                               remat=remat)

    return _gpipe_schedule(p, x, context, mesh=mesh,
                           microbatches=microbatches, stage_fn=stage_fn,
                           aux_zero=aux_zero, pipe_axis=pipe_axis,
                           data_axis=data_axis)


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
        raise TypeError(
            'pp_cond_transformer_apply got MoE params — use '
            'pp_moe_cond_transformer_apply (returns (logits, aux))')

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


def pp_moe_cond_transformer_apply(p, x, context=None, *, cfg, mesh,
                                  microbatches, key=None, deterministic=True,
                                  backend=None, remat=False,
                                  pipe_axis=MODEL_AXIS, data_axis=DATA_AXIS,
                                  return_hidden=False):
    """Pipelined MoE stage-2 forward — PP × MoE composition (VERDICT
    r4 #6).  Same shape contract as
    ``models.moe_transformer.moe_cond_transformer_apply``: returns
    (logits, aux) — or (post-LN hidden, aux) with ``return_hidden``."""
    from ..models.transformer import head_project
    from ..nn.core import layernorm, linear

    x = linear(p['token_proj'], x)
    x = x + p['pos_embed'].astype(x.dtype)
    if context is not None and 'context_proj' in p:
        context = linear(p['context_proj'], context.astype(x.dtype))
    elif context is not None:
        context = context.astype(x.dtype)
    x, aux = pp_moe_stack_apply(
        p['layers'], x, context, mesh=mesh, microbatches=microbatches,
        heads=cfg.num_head, num_selected=cfg.num_selected,
        capacity_factor=cfg.capacity_factor, dropout_rate=cfg.dropout,
        key=key, deterministic=deterministic, backend=backend, remat=remat,
        pipe_axis=pipe_axis, data_axis=data_axis)
    x = layernorm(p['norm'], x)
    if return_hidden:
        return x, aux
    return head_project(p, x), aux


def shard_for_pp(params, mesh, pipe_axis=MODEL_AXIS):
    """Place CondTransformer params for pipeline execution (dense or MoE —
    both stack layouts lead with the depth axis)."""
    spec = pp_cond_transformer_param_spec(params, pipe_axis)
    return jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), params, spec)
