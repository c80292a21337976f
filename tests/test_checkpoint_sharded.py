"""Sharding-native checkpointing (utils/trainer._save_state/_restore_state).

The trainers hand orbax the *placed* train state — sharded leaves are
staged shard-by-shard from their owning devices (no host-side full-array
gather) and restores land directly in the target placement via
sharding-annotated abstract templates.  The on-disk format is
placement-free, so a checkpoint written under one mesh topology restores
under another.  This exceeds the reference's blocking whole-model
``torch.save(state_dict)`` snapshots (reference utils/trainer.py:261-264).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from paintmind_tpu.parallel.mesh import make_mesh


def _sharded_state(mesh):
    return {
        'w': jax.device_put(jnp.arange(64, dtype=jnp.float32).reshape(8, 8),
                            NamedSharding(mesh, P('data', 'model'))),
        'b': jax.device_put(jnp.full((4,), 3.0),
                            NamedSharding(mesh, P())),
        'step': jax.device_put(jnp.asarray(7, jnp.int32),
                               NamedSharding(mesh, P())),
    }


def _abstract(tree):
    return jax.tree_util.tree_map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=l.sharding)
        if isinstance(l, jax.Array) else l, tree)


def test_sharded_roundtrip_across_topologies(tmp_path):
    """A checkpoint written on a 4×2 mesh restores onto a 2×4 mesh with
    *different* partition specs — values identical, placement the new
    template's."""
    import orbax.checkpoint as ocp

    mesh_a = make_mesh(model_parallel=2)        # 4×2 data×model
    state = _sharded_state(mesh_a)
    want = {k: np.asarray(v) for k, v in state.items()}

    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(tmp_path, 'ck')
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()

    mesh_b = make_mesh(model_parallel=4)        # 2×4 — new topology
    target = NamedSharding(mesh_b, P('model', 'data'))  # transposed spec
    template = {
        'w': jax.ShapeDtypeStruct((8, 8), jnp.float32, sharding=target),
        'b': jax.ShapeDtypeStruct((4,), jnp.float32,
                                  sharding=NamedSharding(mesh_b, P('data'))),
        'step': jax.ShapeDtypeStruct((), jnp.int32,
                                     sharding=NamedSharding(mesh_b, P())),
    }
    restored = ckptr.restore(path, template)
    assert restored['w'].sharding == target
    assert restored['b'].sharding.spec == P('data')
    for k in want:
        np.testing.assert_array_equal(np.asarray(restored[k]), want[k])


def test_async_save_is_staged_before_return(tmp_path):
    """The train step donates the state buffers (trainer.py jit
    donate_argnums) — so ``save()`` must have finished its device→host
    staging copy by the time it returns.  Deleting the source arrays
    immediately after save() simulates donation by the next step."""
    import orbax.checkpoint as ocp

    mesh = make_mesh(model_parallel=2)
    state = _sharded_state(mesh)
    want = {k: np.asarray(v) for k, v in state.items()}

    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(tmp_path, 'ck')
    ckptr.save(path, state, force=True)
    for leaf in jax.tree_util.tree_leaves(state):
        leaf.delete()                 # donation: buffers gone
    ckptr.wait_until_finished()       # background write must still succeed

    restored = ckptr.restore(path, _abstract(_sharded_state(mesh)))
    for k in want:
        np.testing.assert_array_equal(np.asarray(restored[k]), want[k])


def test_host_written_checkpoint_restores_sharded(tmp_path):
    """Backward compat: checkpoints written by the pre-round-3 host-gather
    path (numpy leaves) restore through the sharded template unchanged."""
    import orbax.checkpoint as ocp

    mesh = make_mesh(model_parallel=2)
    state = _sharded_state(mesh)
    host_tree = jax.tree_util.tree_map(np.asarray, state)

    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(tmp_path, 'ck')
    ckptr.save(path, host_tree, force=True)
    ckptr.wait_until_finished()

    restored = ckptr.restore(path, _abstract(state))
    assert restored['w'].sharding == state['w'].sharding
    np.testing.assert_array_equal(np.asarray(restored['w']),
                                  host_tree['w'])


def test_trainer_resume_across_meshes(tmp_path):
    """Trainer-level topology change: a ZeRO-1 8-way-dp checkpoint resumes
    into a 4×2-mesh trainer without ZeRO (replicated opt state) — the
    restore template carries the *new* trainer's placement."""
    from paintmind_tpu.models.vqmodel import VQModel
    from paintmind_tpu.utils.trainer import VQGANTrainer
    from test_training import SMALL_VQ, DCFG, _SynthDataset

    ds = _SynthDataset(48, 32)
    kw = dict(num_epoch=1, valid_size=8, batch_size=16, num_workers=1,
              mixed_precision='no', save_every=100, sample_every=100,
              perceptual_weights='none', disc_config=DCFG)
    t1 = VQGANTrainer(VQModel(SMALL_VQ, seed=0), ds,
                      mesh=make_mesh(model_parallel=1), zero_sharding=True,
                      result_folder=str(tmp_path / 'a'),
                      log_dir=str(tmp_path / 'la'), **kw)
    # (zero_opt_spec only shards leaves ≥16384 elements; this toy model
    # stays replicated — the substance here is the 8-dp → 4×2 topology
    # change, which the meshes below make real)
    assert t1.mesh.shape != (lambda m: m.shape)(make_mesh(model_parallel=2))
    ckpt = t1.save()
    t1.finalize_checkpoints()
    want = jax.tree_util.tree_map(np.asarray, t1.state['g_params'])

    t2 = VQGANTrainer(VQModel(SMALL_VQ, seed=9), ds,
                      mesh=make_mesh(model_parallel=2), zero_sharding=False,
                      result_folder=str(tmp_path / 'b'),
                      log_dir=str(tmp_path / 'lb'), **kw)
    t2.resume(ckpt)
    got = jax.tree_util.tree_map(np.asarray, t2.state['g_params'])
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(a, b)
    # restored leaves live in t2's placement (replicated over its mesh)
    leaf = jax.tree_util.tree_leaves(t2.state['g_opt'])[0]
    assert leaf.sharding.mesh.shape == t2.mesh.shape
    assert int(t2.state['step']) == int(t1.state['step'])


def test_keep_last_prunes_old_generations(tmp_path):
    """Retention policy: keep_last=2 leaves only the two newest
    (state dir + npz export) generations; unrelated files survive."""
    from paintmind_tpu.models.vqmodel import VQModel
    from paintmind_tpu.utils.trainer import VQGANTrainer
    from test_training import SMALL_VQ, DCFG, _SynthDataset

    t = VQGANTrainer(VQModel(SMALL_VQ, seed=0), _SynthDataset(48, 32),
                     num_epoch=1, valid_size=8, batch_size=16, num_workers=1,
                     mixed_precision='no', save_every=100, sample_every=100,
                     perceptual_weights='none', disc_config=DCFG,
                     keep_last=2, result_folder=str(tmp_path),
                     log_dir=str(tmp_path / 'log'))
    other = os.path.join(t.model_saved_dir, 'tower.npz')
    open(other, 'wb').close()          # sidecar files are never pruned
    for step in (1, 2, 3):
        t.steps = step
        t.save()
    t.finalize_checkpoints()
    names = sorted(os.listdir(t.model_saved_dir))
    assert names == ['tower.npz',
                     'vit_vq_state_2', 'vit_vq_state_3',
                     'vit_vq_step_2.npz', 'vit_vq_step_3.npz']
    # the survivors still restore
    t.resume(os.path.join(t.model_saved_dir, 'vit_vq_state_3'))
