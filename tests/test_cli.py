"""CLI regression tests (scripts/).

Guards the ADVICE r1 finding: ``generate.py --checkpoint`` must actually
route the local checkpoint into the factory (``pretrained=True`` +
``checkpoint_path``), not silently generate from random init.
"""

import importlib.util
import pathlib
import sys

import numpy as np
import pytest

SCRIPTS = pathlib.Path(__file__).resolve().parents[1] / 'scripts'

TINY_VQ = {
    'n_embed': 64, 'embed_dim': 8, 'beta': 0.25,
    'enc': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 1,
            'num_head': 2, 'mlp_dim': 64, 'in_channels': 3, 'dim_head': 16,
            'dropout': 0.0},
    'dec': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 1,
            'num_head': 2, 'mlp_dim': 64, 'out_channels': 3, 'dim_head': 16,
            'dropout': 0.0},
}


@pytest.fixture
def tiny_version():
    import paintmind_tpu.config as pmc
    pmc.register_version('test-vqgan-cli', TINY_VQ)
    return 'test-vqgan-cli'


def _load_script(name):
    spec = importlib.util.spec_from_file_location(name, SCRIPTS / f'{name}.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _DummyPipeline:
    def __init__(self, calls):
        self.calls = calls

    def generate(self, **kw):
        self.calls['generate'] = kw
        return [np.zeros((1, 32, 32, 3), np.float32)]


def test_generate_cli_routes_checkpoint_into_factory(tmp_path, monkeypatch):
    import paintmind_tpu as pm

    ckpt = tmp_path / 'pipe.npz'
    ckpt.write_bytes(b'')  # existence is irrelevant; factory call is captured
    out = tmp_path / 'o.png'

    calls = {}

    def fake_create_model(**kw):
        calls['factory'] = kw
        return _DummyPipeline(calls)

    monkeypatch.setattr(pm, 'create_model', fake_create_model)
    monkeypatch.setattr(sys, 'argv', [
        'generate.py', 'a red fox', '--checkpoint', str(ckpt),
        '--out', str(out), '--timesteps', '2', '--topk', '2'])
    gen = _load_script('generate')
    gen.main()

    f = calls['factory']
    # pretrained must be truthy or the factory never loads ANY checkpoint
    assert f['pretrained'] is True
    assert f['checkpoint_path'] == str(ckpt)
    assert calls['generate']['timesteps'] == 2
    assert out.exists()


def test_generate_cli_hub_path_when_no_checkpoint(tmp_path, monkeypatch):
    import paintmind_tpu as pm

    calls = {}

    def fake_create_model(**kw):
        calls['factory'] = kw
        return _DummyPipeline(calls)

    monkeypatch.setattr(pm, 'create_model', fake_create_model)
    monkeypatch.setattr(sys, 'argv', [
        'generate.py', '--out', str(tmp_path / 'o.png')])
    _load_script('generate').main()
    assert calls['factory']['pretrained'] is True
    assert calls['factory']['checkpoint_path'] is None


def test_factory_checkpoint_actually_changes_params(tmp_path, tiny_version):
    """pretrained=True + checkpoint_path must yield different params than a
    fresh init (i.e. the file was really loaded)."""
    import paintmind_tpu as pm

    fresh = pm.create_model(arch='vqgan', version=tiny_version,
                            pretrained=False)
    # mutate + save, then reload via the factory
    import jax
    mutated = jax.tree_util.tree_map(lambda a: a + 1.0, fresh.params)
    fresh.params = mutated
    path = tmp_path / 'mut.npz'
    fresh.save_pretrained(str(path))

    loaded = pm.create_model(arch='vqgan', version=tiny_version,
                             pretrained=True, checkpoint_path=str(path))
    l1 = jax.tree_util.tree_leaves(loaded.params)
    l2 = jax.tree_util.tree_leaves(mutated)
    assert all(np.allclose(a, b) for a, b in zip(l1, l2))


def test_factory_unknown_arch_message(tiny_version):
    import paintmind_tpu as pm
    with pytest.raises(ValueError, match='unknown arch'):
        pm.create_model(arch='nope', version=tiny_version,
                        pretrained=False)


def test_verify_parity_fake_mode():
    """tools/verify_parity.py --fake: the convert→compare harness runs
    offline with locally built artifacts (VERDICT r2 #8); every check ends
    'ok' or 'skipped' with a documented reason — never 'failed'."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        'verify_parity', os.path.join(os.path.dirname(__file__), os.pardir,
                                      'tools', 'verify_parity.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    report = mod.run(fake=True)
    assert set(report) == {'vqgan-hub', 'lpips', 'inception', 't5-real',
                           'clip-real'}
    for name, res in report.items():
        assert res['status'] in ('ok', 'skipped'), (name, res)
    # at least the four offline-capable checks actually ran
    ran = [k for k, v in report.items() if v['status'] == 'ok']
    assert len(ran) >= 3, report


def test_bench_parent_parses_child_result():
    """bench.py's parent/child protocol: the parent parses the LAST
    @@RESULT@@ marker line of a child's stdout (stray prints must not
    break the driver metric)."""
    spec = importlib.util.spec_from_file_location(
        'bench', pathlib.Path(__file__).resolve().parents[1] / 'bench.py')
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    out = ('some noise\n'
           '@@RESULT@@{"best": 1.0, "best_cfg": 8}\n'
           'more noise\n'
           '@@RESULT@@{"best": 14.27, "best_cfg": 64, "cache_hits": 115}\n')
    r = bench.parse_child(out)
    assert r == {'best': 14.27, 'best_cfg': 64, 'cache_hits': 115}
    assert bench.parse_child('no marker here\n') is None
