"""Serving-tier tests: dynamic batching semantics of GenerationEngine and
the JSON HTTP front end (extension — the reference has no serving story)."""

import base64
import http.client
import io
import json
import threading

import numpy as np
import pytest

import paintmind_tpu.config as pmc  # noqa: E402
from paintmind_tpu.models import pipeline as pl  # noqa: E402
from paintmind_tpu.serving import (GenerateRequest, GenerationEngine,  # noqa: E402
                                   ReconstructRequest, make_server)

SMALL_VQ = {
    'n_embed': 64, 'embed_dim': 8, 'beta': 0.25,
    'enc': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 1,
            'num_head': 2, 'mlp_dim': 64, 'in_channels': 3, 'dim_head': 16,
            'dropout': 0.0},
    'dec': {'image_size': 32, 'patch_size': 8, 'dim': 32, 'depth': 1,
            'num_head': 2, 'mlp_dim': 64, 'out_channels': 3, 'dim_head': 16,
            'dropout': 0.0},
}
pmc.register_version('test-vqgan-serve', SMALL_VQ)

SMALL_PIPE = pl.PipelineConfig(
    stage1='test-vqgan-serve', t5='t5-l', dim=32, dim_head=16, mlp_dim=64,
    num_head=2, depth=1, dropout=0.0,
    vqc=pl.vm.VQModelConfig.from_dict(SMALL_VQ), t5_dim=48)


@pytest.fixture(scope='module')
def pipe():
    return pl.Pipeline(config=SMALL_PIPE, stage1_pretrained=False,
                       text_encoder=None)


def test_engine_batches_concurrent_requests(pipe):
    with GenerationEngine(pipe, max_batch=8, max_wait_ms=200) as eng:
        reqs = [GenerateRequest(timesteps=2, topk=2, seed=i)
                for i in range(4)]
        futs = [eng.submit(r) for r in reqs]
        outs = [f.result(timeout=120) for f in futs]
    for img in outs:
        assert img.shape == (32, 32, 3)
        assert np.isfinite(img).all()
    stats = eng.stats()
    assert stats['requests'] == 4
    # all four compatible requests should have coalesced into few batches
    assert stats['batches'] <= 2
    assert stats['mean_batch_occupancy'] >= 2


def test_incompatible_signatures_run_separately(pipe):
    with GenerationEngine(pipe, max_batch=8, max_wait_ms=50) as eng:
        f1 = eng.submit(GenerateRequest(timesteps=2, topk=2))
        f2 = eng.submit(GenerateRequest(timesteps=3, topk=2))
        a, b = f1.result(timeout=120), f2.result(timeout=120)
    assert a.shape == b.shape == (32, 32, 3)
    assert eng.stats()['batches'] == 2


def test_padded_bucket_slots_are_sliced_away(pipe):
    with GenerationEngine(pipe, max_batch=8, max_wait_ms=200) as eng:
        futs = [eng.submit(GenerateRequest(timesteps=2, topk=2))
                for _ in range(3)]
        outs = [f.result(timeout=120) for f in futs]
    assert len(outs) == 3
    # 3 requests pad to the 4-bucket: exactly one padded slot
    assert eng.stats()['padded_slots'] >= 1


def test_conditioned_requests_batch_on_context(pipe):
    rng = np.random.default_rng(0)
    ctx = rng.standard_normal((5, 48)).astype(np.float32)
    with GenerationEngine(pipe, max_batch=4, max_wait_ms=200) as eng:
        futs = [eng.submit(GenerateRequest(context=ctx, timesteps=2, topk=2,
                                           guidance_scale=2.0))
                for _ in range(2)]
        outs = [f.result(timeout=120) for f in futs]
    assert all(o.shape == (32, 32, 3) for o in outs)
    assert eng.stats()['batches'] == 1


def test_reconstruct_request(pipe):
    x = np.random.default_rng(1).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    with GenerationEngine(pipe, max_batch=4, max_wait_ms=10) as eng:
        rec = eng.submit(ReconstructRequest(image=x)).result(timeout=120)
    assert rec.shape == x.shape
    assert np.isfinite(rec).all()


def test_closed_engine_rejects_submissions(pipe):
    eng = GenerationEngine(pipe, max_batch=2, max_wait_ms=1)
    eng.close()
    with pytest.raises(RuntimeError):
        eng.submit(GenerateRequest(timesteps=2))


def test_http_server_endpoints(pipe):
    from PIL import Image
    with GenerationEngine(pipe, max_batch=4, max_wait_ms=10) as eng:
        httpd = make_server(eng, port=0)  # ephemeral port
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            conn = http.client.HTTPConnection('127.0.0.1', port, timeout=300)

            conn.request('GET', '/healthz')
            assert json.loads(conn.getresponse().read()) == {'ok': True}

            conn.request('POST', '/generate',
                         json.dumps({'timesteps': 2, 'topk': 2, 'seed': 7}),
                         {'Content-Type': 'application/json'})
            out = json.loads(conn.getresponse().read())
            img = Image.open(io.BytesIO(base64.b64decode(out['image'])))
            assert img.size == (32, 32)

            # reconstruct an arbitrary-size image (transform resizes it)
            src = Image.fromarray(np.random.default_rng(2).integers(
                0, 255, (40, 50, 3), dtype=np.uint8), 'RGB')
            buf = io.BytesIO()
            src.save(buf, format='PNG')
            conn.request('POST', '/reconstruct', json.dumps(
                {'image': base64.b64encode(buf.getvalue()).decode()}),
                {'Content-Type': 'application/json'})
            out = json.loads(conn.getresponse().read())
            rec = Image.open(io.BytesIO(base64.b64decode(out['image'])))
            assert rec.size == (32, 32)

            conn.request('GET', '/stats')
            stats = json.loads(conn.getresponse().read())
            assert stats['requests'] >= 2

            conn.request('POST', '/nope', '{}')
            assert conn.getresponse().status == 404
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_paint_requests_batch_and_return_images(pipe):
    from paintmind_tpu.serving import PaintRequest
    rng = np.random.default_rng(4)
    imgs = rng.uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)
    with GenerationEngine(pipe, max_batch=4, max_wait_ms=200) as eng:
        futs = [eng.submit(PaintRequest(image=imgs[i], coord=(8, 8, 16, 16),
                                        mode='inpaint', timesteps=2, topk=2))
                for i in range(3)]
        outs = [f.result(timeout=120) for f in futs]
    assert all(o.shape == (32, 32, 3) for o in outs)
    assert all(np.isfinite(o).all() for o in outs)
    # same coord+mode signature → one padded batch
    assert eng.stats()['batches'] == 1


def test_paint_requests_with_different_rects_coalesce(pipe):
    """VERDICT r2 #6: the rect is a per-sample keep-mask tensor, not part
    of the compiled-program signature — different rects AND different
    modes must run as ONE batch, each output respecting its own rect."""
    from paintmind_tpu.serving import PaintRequest
    rng = np.random.default_rng(7)
    imgs = rng.uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)
    reqs = [
        PaintRequest(image=imgs[0], coord=(0, 0, 16, 16), mode='inpaint',
                     timesteps=2, topk=2, seed=0),
        PaintRequest(image=imgs[1], coord=(8, 16, 16, 8), mode='inpaint',
                     timesteps=2, topk=2, seed=0),
        PaintRequest(image=imgs[2], coord=(8, 8, 16, 16), mode='outpaint',
                     timesteps=2, topk=2, seed=0),
    ]
    with GenerationEngine(pipe, max_batch=4, max_wait_ms=300) as eng:
        outs = [f.result(timeout=120)
                for f in [eng.submit(r) for r in reqs]]
    assert eng.stats()['batches'] == 1  # all three coalesced
    assert all(o.shape == (32, 32, 3) for o in outs)


def test_batched_mixed_rect_paint_matches_single_requests(pipe):
    """Pipeline-level 'done' criterion for VERDICT r2 #6: one batched
    paint call with per-sample keep-masks must equal per-sample calls
    (temperature 0 / topk 1 → deterministic, batch-size independent)."""
    import jax
    rng = np.random.default_rng(8)
    imgs = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    masks = np.concatenate([
        np.asarray(pipe._rect_latent_mask((0, 0, 16, 16), inside=0)),
        np.asarray(pipe._rect_latent_mask((8, 8, 24, 16), inside=1)),
    ], axis=0)
    key = jax.random.PRNGKey(11)
    batched = np.asarray(pipe.paint(imgs, masks, timesteps=2, topk=1,
                                    temperature=0.0, key=key))
    for i in range(2):
        single = np.asarray(pipe.paint(imgs[i:i + 1], masks[i:i + 1],
                                       timesteps=2, topk=1,
                                       temperature=0.0, key=key))[0]
        np.testing.assert_allclose(batched[i], single, atol=1e-5)


def test_mixed_temperature_requests_coalesce(pipe):
    """VERDICT r2 #7: temperature is a traced per-sample vector — requests
    differing only in temperature share one compiled program and batch."""
    with GenerationEngine(pipe, max_batch=8, max_wait_ms=300) as eng:
        futs = [eng.submit(GenerateRequest(timesteps=2, topk=2, seed=i,
                                           temperature=t))
                for i, t in enumerate((0.5, 1.0, 1.7))]
        outs = [f.result(timeout=120) for f in futs]
    assert eng.stats()['batches'] == 1
    assert all(o.shape == (32, 32, 3) for o in outs)


def test_mixed_guidance_requests_coalesce(pipe):
    """guidance_scale is a traced per-sample operand: guided requests
    differing only in scale share one program and batch; the unguided
    request takes its own (cond-only) program."""
    ctx = np.random.default_rng(11).standard_normal((5, 48)).astype(
        np.float32)
    with GenerationEngine(pipe, max_batch=8, max_wait_ms=300) as eng:
        futs = [eng.submit(GenerateRequest(context=ctx, timesteps=2, topk=2,
                                           seed=i, guidance_scale=g))
                for i, g in enumerate((1.5, 3.0, 7.5))]
        outs = [f.result(timeout=300) for f in futs]
    assert eng.stats()['batches'] == 1
    assert all(o.shape == (32, 32, 3) for o in outs)


def test_per_sample_guidance_vector_matches_scalar(pipe):
    """A uniform per-sample guidance vector equals the scalar path, and
    changing the scalar does not change program identity (traced operand)."""
    import jax
    key = jax.random.PRNGKey(7)
    ctx = jax.numpy.asarray(np.random.default_rng(12).standard_normal(
        (2, 5, 48)).astype(np.float32))
    a = pipe.generate(text=ctx, timesteps=3, topk=2, guidance_scale=2.5,
                      decode_steps='final', key=key)[-1]
    b = pipe.generate(text=ctx, timesteps=3, topk=2,
                      guidance_scale=np.array([2.5, 2.5], np.float32),
                      decode_steps='final', key=key)[-1]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_per_sample_temperature_vector_matches_scalar(pipe):
    """A uniform per-sample temperature vector must equal the scalar path
    exactly (same program semantics, VERDICT r2 #7 'done' criterion)."""
    import jax
    key = jax.random.PRNGKey(3)
    a = pipe.generate(num_samples=2, timesteps=3, topk=2, temperature=1.3,
                      decode_steps='final', key=key)[-1]
    b = pipe.generate(num_samples=2, timesteps=3, topk=2,
                      temperature=np.array([1.3, 1.3], np.float32),
                      decode_steps='final', key=key)[-1]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_http_paint_endpoint(pipe):
    from PIL import Image
    with GenerationEngine(pipe, max_batch=4, max_wait_ms=10) as eng:
        httpd = make_server(eng, port=0)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            src = Image.fromarray(np.random.default_rng(5).integers(
                0, 255, (32, 32, 3), dtype=np.uint8), 'RGB')
            buf = io.BytesIO()
            src.save(buf, format='PNG')
            conn = http.client.HTTPConnection('127.0.0.1', port, timeout=300)
            conn.request('POST', '/outpaint', json.dumps({
                'image': base64.b64encode(buf.getvalue()).decode(),
                'coord': [8, 8, 16, 16], 'timesteps': 2, 'topk': 2}),
                {'Content-Type': 'application/json'})
            out = json.loads(conn.getresponse().read())
            img = Image.open(io.BytesIO(base64.b64decode(out['image'])))
            assert img.size == (32, 32)
            bad_payloads = [
                {},                          # missing coord
                {'coord': [1, 2, 3]},        # wrong length
                {'coord': [0, 0, 999, 999]},  # out of bounds
            ]
            for extra in bad_payloads:  # each → 400, not an opaque 500
                conn.request('POST', '/inpaint', json.dumps({
                    'image': base64.b64encode(buf.getvalue()).decode(),
                    **extra}))
                resp = conn.getresponse()
                resp.read()  # drain before connection reuse
                assert resp.status == 400
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_backpressure_rejects_when_queue_full(pipe):
    from paintmind_tpu.serving import EngineOverloaded
    eng = GenerationEngine(pipe, max_batch=2, max_wait_ms=2000, max_queue=2)
    try:
        futs = []
        rejected = 0
        for _ in range(12):
            try:
                futs.append(eng.submit(GenerateRequest(timesteps=2, topk=2)))
            except EngineOverloaded:
                rejected += 1
        assert rejected >= 1
        assert eng.stats().get('rejected', 0) == rejected
        for f in futs:
            assert f.result(timeout=120).shape == (32, 32, 3)
    finally:
        eng.close()


def test_mixed_signature_concurrency_stress(pipe):
    """Many concurrent requests across four signatures: everything resolves,
    nothing deadlocks, per-signature batches form."""
    rng = np.random.default_rng(6)
    ctx = rng.standard_normal((5, 48)).astype(np.float32)
    img = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    reqs = []
    for i in range(24):
        kind = i % 4
        if kind == 0:
            reqs.append(GenerateRequest(timesteps=2, topk=2))
        elif kind == 1:
            reqs.append(GenerateRequest(timesteps=3, topk=2))
        elif kind == 2:
            reqs.append(GenerateRequest(context=ctx, timesteps=2, topk=2,
                                        guidance_scale=1.5))
        else:
            reqs.append(ReconstructRequest(image=img))
    with GenerationEngine(pipe, max_batch=8, max_wait_ms=100) as eng:
        futs = [eng.submit(r) for r in reqs]
        outs = [f.result(timeout=300) for f in futs]
    assert all(o.shape == (32, 32, 3) for o in outs)
    stats = eng.stats()
    assert stats['requests'] == 24
    assert stats['batches'] >= 4  # at least one batch per signature
    assert stats['mean_batch_occupancy'] > 1.5  # real coalescing happened


def test_http_503_when_overloaded(pipe):
    with GenerationEngine(pipe, max_batch=2, max_wait_ms=1,
                          max_queue=0) as eng:  # everything sheds
        httpd = make_server(eng, port=0)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            conn = http.client.HTTPConnection('127.0.0.1', port, timeout=60)
            conn.request('POST', '/generate', json.dumps({'timesteps': 2}))
            resp = conn.getresponse()
            assert resp.status == 503
            assert json.loads(resp.read())['retry'] is True
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_http_variations_endpoint():
    """Image-conditioned pipeline serves /variations; the N samples ride
    the normal dynamic batching and come back distinct."""
    from PIL import Image
    from paintmind_tpu.models.clip import (CLIPImageEmbedder,
                                           CLIPVisionConfig)
    tower = CLIPImageEmbedder(cfg=CLIPVisionConfig(
        image_size=28, patch_size=14, width=24, heads=2, layers=1), seed=5)
    imgvar_pipe = pl.Pipeline(pl.PipelineConfig(
        stage1='test-vqgan-serve', t5='clip-img-l', dim=32, dim_head=16,
        mlp_dim=64, num_head=2, depth=1, dropout=0.0,
        vqc=pl.vm.VQModelConfig.from_dict(SMALL_VQ), t5_dim=24),
        stage1_pretrained=False, text_encoder=tower)
    with GenerationEngine(imgvar_pipe, max_batch=8, max_wait_ms=100) as eng:
        httpd = make_server(eng, port=0)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            src = Image.fromarray(np.random.default_rng(3).integers(
                0, 255, (32, 32, 3), dtype=np.uint8), 'RGB')
            buf = io.BytesIO()
            src.save(buf, format='PNG')
            conn = http.client.HTTPConnection('127.0.0.1', port, timeout=300)
            conn.request('POST', '/variations', json.dumps(
                {'image': base64.b64encode(buf.getvalue()).decode(),
                 'num': 3, 'timesteps': 2, 'topk': 2}),
                {'Content-Type': 'application/json'})
            out = json.loads(conn.getresponse().read())
            assert len(out['images']) == 3
            arrs = [np.asarray(Image.open(io.BytesIO(base64.b64decode(b))))
                    for b in out['images']]
            assert all(a.shape == (32, 32, 3) for a in arrs)
            # distinct gumbel noise per batch row → actual variations
            assert not np.array_equal(arrs[0], arrs[1])
            # the 3 sibling requests coalesced (shared context signature)
            assert eng.stats()['mean_batch_occupancy'] > 1.5
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_http_variations_rejects_text_pipeline(pipe):
    from PIL import Image
    with GenerationEngine(pipe, max_batch=2, max_wait_ms=10) as eng:
        httpd = make_server(eng, port=0)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            src = Image.fromarray(np.zeros((32, 32, 3), np.uint8), 'RGB')
            buf = io.BytesIO()
            src.save(buf, format='PNG')
            conn = http.client.HTTPConnection('127.0.0.1', port, timeout=60)
            conn.request('POST', '/variations', json.dumps(
                {'image': base64.b64encode(buf.getvalue()).decode()}),
                {'Content-Type': 'application/json'})
            resp = conn.getresponse()
            assert resp.status == 400
            assert 'tower' in json.loads(resp.read())['error']
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_engine_serves_quantized_pipeline():
    """The dynamic-batching engine over an int8-quantized pipeline (the
    scripts/serve.py --quantize path); min_dim lowered so the tiny test
    transformer actually quantizes."""
    qpipe = pl.Pipeline(config=SMALL_PIPE, stage1_pretrained=False,
                        text_encoder=None)
    qpipe.quantize('w8a8', min_dim=16)
    from paintmind_tpu.nn.quant import is_quantized
    assert is_quantized(qpipe.params['transformer']['layers']['attn1']['to_q'])
    with GenerationEngine(qpipe, max_batch=8, max_wait_ms=100) as eng:
        futs = [eng.submit(GenerateRequest(timesteps=2, topk=2, seed=i))
                for i in range(3)]
        outs = [f.result(timeout=120) for f in futs]
    for img in outs:
        assert img.shape == (32, 32, 3)
        assert np.isfinite(img).all()


def test_cancelled_requests_do_not_wedge_the_engine(pipe):
    """A future cancelled after submit (e.g. a 503'd /variations fan-out)
    must neither crash the dispatch thread (set_result on a cancelled
    future raises) nor block later requests; whether the cancel wins the
    race is timing-dependent, but every outcome must be clean."""
    with GenerationEngine(pipe, max_batch=4, max_wait_ms=400) as eng:
        fa = eng.submit(GenerateRequest(timesteps=2, topk=2, seed=0))
        fb = eng.submit(GenerateRequest(timesteps=2, topk=2, seed=1))
        won = fb.cancel()
        assert fa.result(timeout=120).shape == (32, 32, 3)
        if won:
            assert fb.cancelled()
        else:
            assert fb.result(timeout=120).shape == (32, 32, 3)
        # dispatcher must still be alive after handling the cancellation
        fc = eng.submit(GenerateRequest(timesteps=2, topk=2, seed=2))
        assert fc.result(timeout=120).shape == (32, 32, 3)


def test_engine_serves_moe_pipeline():
    """The engine is routing-agnostic: an MoE pipeline (first-class
    version dispatch, models/pipeline.py) serves generate + reconstruct
    through the same batching path."""
    moe_cfg = pl.PipelineConfig(
        stage1='test-vqgan-serve', t5='t5-l', dim=32, dim_head=16,
        mlp_dim=64, num_head=2, depth=1, dropout=0.0,
        vqc=pl.vm.VQModelConfig.from_dict(SMALL_VQ), t5_dim=48,
        num_experts=4, num_selected=2, capacity_factor=2.0)
    moe_pipe = pl.Pipeline(config=moe_cfg, stage1_pretrained=False,
                           text_encoder=None)
    assert 'router' in moe_pipe.params['transformer']['layers']['ffnet']
    with GenerationEngine(moe_pipe, max_batch=8, max_wait_ms=200) as eng:
        futs = [eng.submit(GenerateRequest(timesteps=2, topk=2, seed=i))
                for i in range(3)]
        img = np.zeros((32, 32, 3), np.float32)
        fr = eng.submit(ReconstructRequest(image=img))
        outs = [f.result(timeout=180) for f in futs]
        rec = fr.result(timeout=180)
    for out in outs:
        assert out.shape == (32, 32, 3) and np.isfinite(out).all()
    assert rec.shape == (32, 32, 3) and np.isfinite(rec).all()
    assert eng.stats()['batches'] <= 3  # generates coalesced


def test_engine_serves_sharded_pipeline():
    """VERDICT r3 #5: the engine hosts a TP-sharded pipeline (mesh=...) and
    produces IDENTICAL images to the unsharded engine for the same seeded
    requests — sharding is a placement choice, not a model change."""
    import jax
    from paintmind_tpu.parallel import mesh as pmesh
    from paintmind_tpu.parallel.context import set_active_mesh
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')

    def outputs(mesh):
        pipe2 = pl.Pipeline(config=SMALL_PIPE, stage1_pretrained=False,
                            text_encoder=None, seed=0)
        try:
            with GenerationEngine(pipe2, max_batch=4, max_wait_ms=200,
                                  mesh=mesh) as eng:
                futs = [eng.submit(GenerateRequest(timesteps=2, topk=1,
                                                   temperature=0.0, seed=i))
                        for i in range(3)]
                outs = [f.result(timeout=300) for f in futs]
                stats = eng.stats()
            return outs, stats
        finally:
            set_active_mesh(None)

    ref, _ = outputs(None)
    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=4)
    sh, stats = outputs(mesh)
    assert stats['batches'] >= 1
    for a, b in zip(ref, sh):
        assert float(np.max(np.abs(a - b))) < 1e-4

    # sequence-parallel activation layout serves too (512²-variant path)
    pipe_sp = pl.Pipeline(config=SMALL_PIPE, stage1_pretrained=False,
                          text_encoder=None, seed=0)
    try:
        with GenerationEngine(pipe_sp, max_batch=4, max_wait_ms=100,
                              mesh=mesh, sequence_parallel=True) as eng:
            out = eng.submit(GenerateRequest(timesteps=2, topk=1,
                                             temperature=0.0,
                                             seed=0)).result(timeout=300)
        assert np.isfinite(out).all() and out.shape == (32, 32, 3)
    finally:
        set_active_mesh(None)


def test_engine_serves_pipeline_parallel_pipeline():
    """Round 5: the engine hosts a pipeline-parallel placement
    (pp_microbatches=...) — buckets are raised to the dp × microbatches
    multiple the GPipe decode needs, and seeded outputs match the plain
    engine.  Also exercises the PP × MoE variant end-to-end."""
    import jax
    from paintmind_tpu.parallel import mesh as pmesh
    from paintmind_tpu.parallel.context import set_active_mesh
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')

    import dataclasses
    cfg4 = dataclasses.replace(SMALL_PIPE, depth=4)  # 4 layers / 4 stages

    def outputs(mesh, pp):
        pipe2 = pl.Pipeline(config=cfg4, stage1_pretrained=False,
                            text_encoder=None, seed=0)
        try:
            with GenerationEngine(pipe2, max_batch=4, max_wait_ms=200,
                                  mesh=mesh, pp_microbatches=pp) as eng:
                fut = eng.submit(GenerateRequest(timesteps=2, topk=1,
                                                 temperature=0.0, seed=7))
                out = fut.result(timeout=300)
                stats = eng.stats()
            return out, stats
        finally:
            set_active_mesh(None)

    ref, _ = outputs(None, None)
    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=4)
    out, stats = outputs(mesh, 2)
    # one request, min bucket dp(2) × microbatches(2) = 4 padded slots - 1
    assert stats['padded_slots'] == 3
    assert float(np.max(np.abs(out - ref))) < 1e-4

    with pytest.raises(ValueError, match='divisible'):
        GenerationEngine(pl.Pipeline(config=cfg4, stage1_pretrained=False,
                                     text_encoder=None, seed=0),
                         max_batch=6, mesh=mesh, pp_microbatches=4)

    # PP × MoE through the engine
    moe_cfg = dataclasses.replace(cfg4, num_experts=2, capacity_factor=1.0)
    moe_pipe = pl.Pipeline(config=moe_cfg, stage1_pretrained=False,
                           text_encoder=None, seed=0)
    try:
        with GenerationEngine(moe_pipe, max_batch=4, max_wait_ms=100,
                              mesh=mesh, pp_microbatches=2) as eng:
            out = eng.submit(GenerateRequest(timesteps=2, topk=1,
                                             temperature=0.0,
                                             seed=1)).result(timeout=300)
        assert np.isfinite(out).all() and out.shape == (32, 32, 3)
    finally:
        set_active_mesh(None)
