"""Worker for test_multiprocess.py: one of two `jax.distributed` processes.

Runs the REAL stage-2 pipeline loss+grad as a data-parallel SPMD program
over the 8-device global mesh (4 local CPU devices per process, gloo
collectives), then recomputes the identical global batch on one local
device and prints both results as JSON for the parent to compare.

Usage: python _mp_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=4'
                           ).strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_cpu_collectives_implementation', 'gloo')

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

import paintmind_tpu.config as pmc  # noqa: E402
from paintmind_tpu.models import pipeline as pl  # noqa: E402
from paintmind_tpu.parallel import multihost  # noqa: E402

info = multihost.initialize(f'localhost:{port}', num_processes=nproc,
                            process_id=pid)
assert info['process_count'] == nproc, info
assert multihost.is_main_process() == (pid == 0)

SMALL_VQ = {
    'n_embed': 64, 'embed_dim': 8, 'beta': 0.25,
    'enc': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 1,
            'num_head': 2, 'mlp_dim': 64, 'in_channels': 3, 'dim_head': 16,
            'dropout': 0.0},
    'dec': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 1,
            'num_head': 2, 'mlp_dim': 64, 'out_channels': 3, 'dim_head': 16,
            'dropout': 0.0},
}
pmc.register_version('test-vqgan-mp', SMALL_VQ)
CFG = pl.PipelineConfig(
    stage1='test-vqgan-mp', t5='t5-l', dim=32, dim_head=16, mlp_dim=64,
    num_head=2, depth=2, dropout=0.0,
    vqc=pl.vm.VQModelConfig.from_dict(SMALL_VQ), t5_dim=48)

# identical seed in both processes → identical replicated params
params = pl.init_pipeline(jax.random.PRNGKey(0), CFG)

# deterministic global batch of 8; this process owns rows [4·pid, 4·pid+4)
rng = np.random.default_rng(42)
full_imgs = rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
full_ctx = rng.standard_normal((8, 5, 48)).astype(np.float32)
local_sl = slice(4 * pid, 4 * pid + 4)
key = jax.random.PRNGKey(7)
ratio = jnp.float32(0.5)


def loss_and_gnorm(p, imgs, ctx):
    def f(p_):
        return pl.pipeline_loss(p_, imgs, ctx, ratio, key, cfg=CFG)
    loss, grads = jax.value_and_grad(f)(p)
    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in jax.tree_util.tree_leaves(grads)))
    return loss, gnorm


mesh = Mesh(np.asarray(jax.devices()), ('data',))
g_imgs = multihost_utils.host_local_array_to_global_array(
    full_imgs[local_sl], mesh, P('data'))
g_ctx = multihost_utils.host_local_array_to_global_array(
    full_ctx[local_sl], mesh, P('data'))
g_params = multihost_utils.host_local_array_to_global_array(
    params, mesh, P())

with mesh:
    rep = NamedSharding(mesh, P())
    dist_loss, dist_gnorm = jax.jit(
        loss_and_gnorm, out_shardings=(rep, rep))(g_params, g_imgs, g_ctx)

# single-device reference on the SAME full batch, computed locally
l_loss, l_gnorm = jax.jit(loss_and_gnorm)(
    jax.device_put(params, jax.local_devices()[0]),
    jnp.asarray(full_imgs), jnp.asarray(full_ctx))

print(json.dumps({
    'pid': pid,
    'process_count': info['process_count'],
    'global_devices': info['global_devices'],
    'local_devices': info['local_devices'],
    'is_main': multihost.is_main_process(),
    'dist_loss': float(dist_loss), 'dist_gnorm': float(dist_gnorm),
    'local_loss': float(l_loss), 'local_gnorm': float(l_gnorm),
}))
