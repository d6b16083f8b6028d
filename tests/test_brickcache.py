"""Brick cache (render/brickcache.py): the macrocell-guided decoded-brick
pool must reproduce the decoded-grid sampling convention exactly on
occupied cells, and the wavefront driven by it must match the decoded-grid
wavefront frame."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.config import (
    EncodingConfig,
    ModelConfig,
    NetworkConfig,
    TransferFunctionConfig,
)
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.models import NeuralField, create_train_state, train_steps
from instantvnr_tpu.models.metrics import decode_volume
from instantvnr_tpu.ops.trilinear import sample_volume
from instantvnr_tpu.render.brickcache import (
    brick_cache_bytes,
    brick_sample_fn,
    build_brick_cache,
    occupied_cells,
)


def _scene(dims=(32, 32, 32), train=60):
    vol = synthetic_volume(dims, kind="vorts")
    from instantvnr_tpu.utils.tfn import bake_transfer_function

    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
    cfg = ModelConfig(
        encoding=EncodingConfig(n_levels=4, n_features_per_level=4,
                                log2_hashmap_size=12, base_resolution=4),
        network=NetworkConfig(n_neurons=32, n_hidden_layers=2),
    )
    field = NeuralField.from_config(cfg)
    state = create_train_state(jax.random.PRNGKey(0), field)
    if train:
        state = train_steps(field, vol.data, state, train, 4096)
    return vol, tf, mc, field, state


class TestBrickCache:
    def test_matches_decoded_grid_on_occupied_cells(self):
        vol, tf, mc, field, state = _scene()
        ctx = build_brick_cache(field, state.params, mc, dilate=1)
        decoded = decode_volume(field, state.params,
                                tuple(int(d) for d in mc.volume_dims))

        # random positions inside OCCUPIED macrocells (incl. cell borders)
        occ = occupied_cells(mc, dilate=0)
        rng = np.random.default_rng(0)
        mx, my, _ = (int(d) for d in mc.dims)
        pick = occ[rng.integers(0, occ.size, 512)]
        cx, cy, cz = pick % mx, (pick // mx) % my, pick // (mx * my)
        base = np.stack([cx, cy, cz], -1).astype(np.float32) * 16.0
        pos_v = base + rng.random((512, 3), np.float32) * 16.0
        p = jnp.asarray(pos_v) / jnp.asarray(
            [float(d) for d in mc.volume_dims])

        got = brick_sample_fn(ctx, p)
        want = sample_volume(decoded, p)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-5)

    def test_boundary_and_miss_behavior(self):
        vol, tf, mc, field, state = _scene(train=0)
        ctx = build_brick_cache(field, state.params, mc, dilate=0)
        # corners/edges of the domain sample finite values
        p = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0],
                         [0.0, 1.0, 0.5], [1.0, 0.0, 0.25]], jnp.float32)
        v = np.asarray(brick_sample_fn(ctx, p))
        assert np.isfinite(v).all()

    def test_empty_tf_misses_return_zero(self):
        vol, tf, mc, field, state = _scene(train=0)
        # zero out the occupancy: every query must be a miss → 0.0
        import dataclasses as dc

        mc0 = dc.replace(mc, max_opacity=jnp.zeros_like(mc.max_opacity))
        ctx = build_brick_cache(field, state.params, mc0, dilate=0)
        p = jnp.asarray(np.random.default_rng(1).random((64, 3), np.float32))
        v = np.asarray(brick_sample_fn(ctx, p))
        np.testing.assert_array_equal(v, 0.0)

    def test_cache_bytes_estimate(self):
        vol, tf, mc, field, state = _scene(train=0)
        n = max(int(occupied_cells(mc, dilate=1).size), 1)
        assert brick_cache_bytes(mc, dilate=1) == n * 20**3 * 8 * 4

    def test_wavefront_frame_matches_decoded_wavefront(self):
        """The compacted wavefront fed by the brick cache must equal the
        same wavefront fed by trilinear lookups of the decoded grid."""
        from instantvnr_tpu.render.camera import Camera
        from instantvnr_tpu.render.raymarch import RaymarchSettings
        from instantvnr_tpu.render.renderer import (
            Renderer,
            reference_sample_fn,
        )

        vol, tf, mc, field, state = _scene()
        dims = tuple(int(d) for d in mc.volume_dims)
        decoded = decode_volume(field, state.params, dims)
        ctx = build_brick_cache(field, state.params, mc, dilate=1)
        cam = Camera(eye=(0.15 * dims[0], 0.1 * dims[1], -2.0 * dims[2]),
                     center=(0, 0, 0), up=(0, 1, 0), fovy=45)

        frames = {}
        for name, fn, c in (("decoded", reference_sample_fn, decoded),
                            ("brick", brick_sample_fn, ctx)):
            r = Renderer(24, 24, mc, tf, fn, sample_ctx=c,
                         settings=RaymarchSettings(n_iters=4, compact=True),
                         seed=7)
            r.set_camera(cam)
            r.render()
            frames[name] = np.asarray(r._frame)
        assert np.isfinite(frames["brick"]).all()
        assert frames["brick"][:, 3].max() > 0.1  # something rendered
        np.testing.assert_allclose(frames["brick"], frames["decoded"],
                                   rtol=0, atol=1e-4)

    def test_emission_parity_check_trips_on_corruption(self):
        """The load-bearing invariant occ_slot[:,0] == mc.max_opacity is
        asserted at runtime (VERDICT r4 #8): corrupting the column must
        raise loudly at the next mapframe, an intact ctx must not."""
        from instantvnr_tpu.render.camera import Camera
        from instantvnr_tpu.render.raymarch import RaymarchSettings
        from instantvnr_tpu.render.renderer import Renderer

        vol, tf, mc, field, state = _scene(train=0)
        dims = tuple(int(d) for d in mc.volume_dims)
        ctx = build_brick_cache(field, state.params, mc, dilate=1)
        assert "occ_slot" in ctx
        cam = Camera(eye=(0.15 * dims[0], 0.1 * dims[1], -2.0 * dims[2]),
                     center=(0, 0, 0), up=(0, 1, 0), fovy=45)
        settings = RaymarchSettings(n_iters=4, compact=True)

        r = Renderer(16, 16, mc, tf, brick_sample_fn, sample_ctx=ctx,
                     settings=settings)
        r.set_camera(cam)
        r.render()
        r.mapframe()  # intact ctx: no raise

        bad = dict(ctx)
        bad["occ_slot"] = ctx["occ_slot"].at[:, 0].add(0.5)
        r.set_sample_ctx(bad)
        with pytest.raises(RuntimeError, match="emission-parity"):
            r.render()
            r.mapframe()

        # a ctx built against a DIFFERENT macrocell grid is loud too
        import dataclasses as dc

        small = dc.replace(
            mc, value_lo=mc.value_lo[:1, :1, :1],
            value_hi=mc.value_hi[:1, :1, :1],
            max_opacity=mc.max_opacity[:1, :1, :1])
        r2 = Renderer(16, 16, small, tf, brick_sample_fn, sample_ctx=ctx,
                      settings=settings)
        with pytest.raises(RuntimeError, match="emission-parity"):
            r2.mapframe()

    def test_grid_pool_exact_on_occupied_cells(self):
        """`build_brick_cache_from_grid` re-tiles the grid voxels
        themselves, so on occupied cells it must equal
        `ops.trilinear.sample_volume` up to trilinear summation order
        (packed sum-of-8 vs nested lerps; ≲1e-7 relative) — unlike the
        neural pool, there is no decode in the way."""
        from instantvnr_tpu.render.brickcache import (
            build_brick_cache_from_grid,
        )

        vol, tf, mc, _, _ = _scene(train=0)
        ctx = build_brick_cache_from_grid(vol.data, mc, dilate=1)

        occ = occupied_cells(mc, dilate=0)
        rng = np.random.default_rng(2)
        mx, my, _ = (int(d) for d in mc.dims)
        pick = occ[rng.integers(0, occ.size, 512)]
        cx, cy, cz = pick % mx, (pick // mx) % my, pick // (mx * my)
        base = np.stack([cx, cy, cz], -1).astype(np.float32) * 16.0
        pos_v = base + rng.random((512, 3), np.float32) * 16.0
        p = jnp.asarray(pos_v) / jnp.asarray(
            [float(d) for d in mc.volume_dims])

        got = np.asarray(brick_sample_fn(ctx, p))
        want = np.asarray(sample_volume(jnp.asarray(vol.data), p))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_pathtracer_grid_bricks_matches(self):
        """PathTraceRenderer's auto grid→brick-pool rewrite is a pure
        sampling-layout change: the tracker only *uses* samples at
        collision candidates (majorant>0 ⇒ occupied cell, where the pool
        is exact up to summation order), so same-seed frames must agree
        to float tolerance with it on and off."""
        from instantvnr_tpu.render.camera import Camera
        from instantvnr_tpu.render.pathtrace import (
            PathTraceRenderer,
            PathTraceSettings,
        )

        vol, tf, mc, _, _ = _scene(train=0)
        cam = Camera(eye=(5, 4, -60), center=(0, 0, 0), up=(0, 1, 0),
                     fovy=45)
        frames = {}
        for bricks in (False, True):
            r = PathTraceRenderer(
                16, 16, mc, tf, vol.data, seed=17,
                settings=PathTraceSettings(max_events=160,
                                           grid_bricks=bricks))
            r.set_camera(cam)
            for _ in range(4):
                r.render()
            frames[bricks] = np.asarray(r._frame)
        assert frames[True][:, 3].max() > 0.1  # something rendered
        np.testing.assert_allclose(frames[True], frames[False],
                                   rtol=0, atol=1e-5)

    def test_incremental_refresh_equals_rebuild(self):
        """refresh_brick_pool round-robin must converge to exactly the
        pool a fresh build produces for the new params (same decode
        lattice, same packing), regardless of the per-call budget."""
        from instantvnr_tpu.render.brickcache import (
            occupied_cells,
            refresh_brick_pool,
        )

        vol, tf, mc, field, state = _scene(train=30)
        ctx_old = build_brick_cache(field, state.params, mc, dilate=1)
        from instantvnr_tpu.models import train_steps as _ts

        state2 = _ts(field, vol.data, state, 30, 4096)  # params moved
        want = build_brick_cache(field, state2.params, mc, dilate=1)
        assert not np.allclose(np.asarray(ctx_old["packed"]),
                               np.asarray(want["packed"]))

        total = occupied_cells(mc, dilate=1).size
        ctx, cur = ctx_old, 0
        steps = 0
        while True:
            ctx, cur = refresh_brick_pool(field, state2.params, ctx,
                                          start=cur, n_bricks=3)
            steps += 1
            if cur == 0:
                break
        assert steps == -(-total // 3)  # ceil(total/3) calls to wrap
        # column 0 is the raw texel (no shift) — exact across the pool;
        # other columns may differ only in never-addressed brick-tail rows
        # (cross-chunk shift spill lands in dead rows by construction)
        np.testing.assert_array_equal(np.asarray(ctx["packed"][:, 0]),
                                      np.asarray(want["packed"][:, 0]))
        # the semantic check: sampling is exactly the fresh build's
        rng = np.random.default_rng(3)
        occ = occupied_cells(mc, dilate=0)
        mx, my, _ = (int(d) for d in mc.dims)
        pick = occ[rng.integers(0, occ.size, 256)]
        base = np.stack([pick % mx, (pick // mx) % my, pick // (mx * my)],
                        -1).astype(np.float32) * 16.0
        p = jnp.asarray(base + rng.random((256, 3), np.float32) * 16.0) \
            / jnp.asarray([float(d) for d in mc.volume_dims])
        np.testing.assert_array_equal(np.asarray(brick_sample_fn(ctx, p)),
                                      np.asarray(brick_sample_fn(want, p)))
        # untouched fields carried over
        np.testing.assert_array_equal(np.asarray(ctx["lut"]),
                                      np.asarray(want["lut"]))

    def test_refresh_is_layout_stable_under_macrocell_drift(self):
        """Online training grows the live macrocell between build and
        refresh; the refresh must follow the CTX's OWN LUT (the pool's
        layout contract), not a re-derived occupancy — a shifted cell list
        would silently write bricks into neighboring cells' pool rows.
        The refreshed pool must sample exactly like a fresh build over the
        ORIGINAL brick set, no matter what macrocell the caller now holds."""
        import dataclasses as dc

        from instantvnr_tpu.render.brickcache import refresh_brick_pool

        vol, tf, mc, field, state = _scene(train=30)
        # build against a REDUCED occupancy (simulates an early-training
        # macrocell that grows later)
        shrunk = np.asarray(mc.max_opacity).copy()
        occ_idx = np.argwhere(shrunk > 1e-6)
        kill = occ_idx[: max(1, len(occ_idx) // 3)]
        shrunk[tuple(kill.T)] = 0.0
        mc_small = dc.replace(mc, max_opacity=jnp.asarray(shrunk))
        ctx = build_brick_cache(field, state.params, mc_small, dilate=1)
        want = build_brick_cache(field, state.params, mc_small, dilate=1)

        # refresh with params UNCHANGED: regardless of chunking, the pool
        # must be unchanged (slot-stable) — the caller's grown `mc` is
        # irrelevant because refresh reads the ctx's lut
        ctx2, cur = refresh_brick_pool(field, state.params, ctx,
                                       start=0, n_bricks=None)
        assert cur == 0
        np.testing.assert_array_equal(np.asarray(ctx2["packed"][:, 0]),
                                      np.asarray(want["packed"][:, 0]))

    def test_facade_pathtrace_decoded_refresh(self):
        """refresh_params in PATHTRACE_DECODED mode must re-apply the
        grid→brick-pool policy (regression: it assigned the raw decoded
        grid while sample_fn stayed brick_sample_fn → TypeError on the
        next render)."""
        from instantvnr_tpu.api import (NeuralVolume, RenderMode,
                                        SimpleVolume, VNRenderer)
        from instantvnr_tpu.config import (EncodingConfig, ModelConfig,
                                           NetworkConfig)
        from instantvnr_tpu.data import synthetic_volume as _sv

        vol = _sv((32, 32, 32), kind="vorts")
        cfg = ModelConfig(
            encoding=EncodingConfig(n_levels=4, n_features_per_level=4,
                                    log2_hashmap_size=12, base_resolution=4),
            network=NetworkConfig(n_neurons=32, n_hidden_layers=2))
        nv = NeuralVolume(cfg, simple=SimpleVolume(vol), train_batch=4096)
        nv.train(30)
        r = VNRenderer(nv, 16, 16, mode=RenderMode.PATHTRACE_DECODED)
        r.render()
        nv.train(10)
        r.refresh_params()
        r.render()  # regression: raised TypeError before the fix
        assert np.isfinite(r.mapframe()).all()

    def test_facade_memory_gating(self, monkeypatch):
        """streaming_cache='auto' builds the f16 pool (the default —
        105.8 dB vs f32, half the gathered bytes) while it fits
        VNR_BRICK_MAX_MB and degrades to exact network sampling past it;
        'brick' still forces the bit-exact f32 pool."""
        from instantvnr_tpu.api import (NeuralVolume, RenderMode,
                                        SimpleVolume, VNRenderer)
        from instantvnr_tpu.config import (EncodingConfig, ModelConfig,
                                           NetworkConfig)
        from instantvnr_tpu.data import synthetic_volume as _sv
        from instantvnr_tpu.render.brickcache import brick_cache_bytes

        vol = _sv((32, 32, 32), kind="vorts")
        cfg = ModelConfig(
            encoding=EncodingConfig(n_levels=4, n_features_per_level=4,
                                    log2_hashmap_size=12, base_resolution=4),
            network=NetworkConfig(n_neurons=32, n_hidden_layers=2))
        nv = NeuralVolume(cfg, simple=SimpleVolume(vol), train_batch=4096)
        nv.train(30)
        mb = brick_cache_bytes(nv.simple.macrocell
                               if hasattr(nv.simple, "macrocell")
                               else nv.macrocell) / 2**20

        cases = [(str(mb * 2), jnp.float16), (str(mb * 0.75), jnp.float16),
                 ("0.001", None)]
        for budget, want in cases:
            monkeypatch.setenv("VNR_BRICK_MAX_MB", budget)
            r = VNRenderer(nv, 16, 16, mode=RenderMode.NEURAL_WAVEFRONT)
            ctx = r._impl.sample_ctx
            if want is None:
                assert not (isinstance(ctx, dict) and "packed" in ctx)
            else:
                assert ctx["packed"].dtype == want, (budget, ctx["packed"].dtype)
            r.render()
            assert np.isfinite(np.asarray(r._impl._frame)).all()
        # 'brick' = forced f32 (bit-exact decoded parity escape hatch)
        monkeypatch.setenv("VNR_BRICK_MAX_MB", "4096")
        rb = VNRenderer(nv, 16, 16, mode=RenderMode.NEURAL_WAVEFRONT,
                        streaming_cache="brick")
        assert rb._impl.sample_ctx["packed"].dtype == jnp.float32

    def test_facade_budgeted_refresh(self):
        """VNRenderer.refresh_params(budget_bricks=N) round-robins the
        streaming cache across calls and keeps rendering live; after the
        cursor wraps, the frame equals a full-rebuild refresh."""
        from instantvnr_tpu.api import (NeuralVolume, RenderMode,
                                        SimpleVolume, VNRenderer)
        from instantvnr_tpu.config import (EncodingConfig, ModelConfig,
                                           NetworkConfig)
        from instantvnr_tpu.data import synthetic_volume as _sv

        vol = _sv((32, 32, 32), kind="vorts")
        cfg = ModelConfig(
            encoding=EncodingConfig(n_levels=4, n_features_per_level=4,
                                    log2_hashmap_size=12, base_resolution=4),
            network=NetworkConfig(n_neurons=32, n_hidden_layers=2))
        nv = NeuralVolume(cfg, simple=SimpleVolume(vol), train_batch=4096)
        def snap(st):  # train_steps donates buffers — keep a live copy
            return jax.tree_util.tree_map(
                lambda x: x + 0 if isinstance(x, jax.Array) else x, st)

        nv.train(40)
        state_a = snap(nv.state)
        nv.train(20)
        state_b = nv.state  # the params the refresh must converge to

        frames = {}
        for budget in (None, 2):
            nv.state = state_a
            r = VNRenderer(nv, 24, 24, mode=RenderMode.NEURAL_WAVEFRONT)
            nv.state = state_b
            if budget is None:
                r.refresh_params()
            else:
                # drive the cursor until it wraps (full coverage)
                r.refresh_params(budget_bricks=budget)
                while getattr(r, "_brick_cursor", 0) != 0:
                    r.refresh_params(budget_bricks=budget)
            r.render()
            frames[budget] = r.mapframe()
            assert np.isfinite(frames[budget]).all()
        np.testing.assert_allclose(frames[2], frames[None],
                                   rtol=0, atol=1e-6)

    def test_fused_sampling_bit_identical(self):
        """The fused path (emit-probe carries slot+cell; one pool gather
        per sample) must render the EXACT frame of the unfused path (LUT
        gather per sample): the probed cell and floor(pos) can differ only
        across a shared face, where both bricks replicate the same source
        texels in their ghost rows."""
        from instantvnr_tpu.render.camera import Camera
        from instantvnr_tpu.render.raymarch import RaymarchSettings
        from instantvnr_tpu.render.renderer import Renderer

        vol, tf, mc, field, state = _scene()
        ctx = build_brick_cache(field, state.params, mc, dilate=1)
        assert "occ_slot" in ctx
        ctx_plain = {k: v for k, v in ctx.items() if k != "occ_slot"}
        cam = Camera(eye=(0.2 * 32, 3, -60), center=(0, 0, 0),
                     up=(0, 1, 0), fovy=45)
        frames = {}
        for name, c in (("fused", ctx), ("plain", ctx_plain)):
            r = Renderer(32, 32, mc, tf, brick_sample_fn, sample_ctx=c,
                         settings=RaymarchSettings(n_iters=8, max_skips=1,
                                                   compact=True), seed=2)
            r.set_camera(cam)
            r.render()
            frames[name] = np.asarray(r._frame)
        assert frames["fused"][:, 3].max() > 0.1
        np.testing.assert_array_equal(frames["fused"], frames["plain"])

    def test_view_cells_covers_marched_cells(self):
        """`view_cells` must be a SUPERSET of every macrocell a frame's
        rays pass through (laziness may never drop a sampled brick): brute
        numpy march of the frame's rays vs the frustum test."""
        from instantvnr_tpu.render.brickcache import view_cells
        from instantvnr_tpu.render.camera import Camera, camera_rays

        vol, tf, mc, _, _ = _scene(train=0)
        dims = np.asarray([float(d) for d in mc.volume_dims])
        mx, my, mz = (int(d) for d in mc.dims)
        cases = [((0.2 * 32, 3, -60), None), ((10, 8, -20), None),
                 ((40, 35, 30), None),
                 # anisotropic scaling: rays map world→voxel by 1/s but
                 # HALF-SPACE normals by s (inverse-transpose) — regression
                 # for the behind-eye plane using the wrong map
                 ((5, 4, -90), (1.0, 1.0, 4.0)),
                 ((30, -20, 25), (2.0, 1.0, 0.5))]
        for eye, scale in cases:
            cam = Camera(eye=eye, center=(0, 0, 0), up=(0, 1, 0), fovy=45)
            s = np.ones(3) if scale is None else np.asarray(scale, float)
            org, dirn = (np.asarray(a) for a in camera_rays(cam, 24, 24))
            org = org / s + dims / 2.0  # world → voxel
            dirn = dirn / s  # transform.rays_to_voxel (unnormalized)
            # slab-method ray-box intersection against [0, dims]
            inv = 1.0 / np.where(np.abs(dirn) < 1e-12, 1e-12, dirn)
            t_lo = (0.0 - org) * inv
            t_hi = (dims - org) * inv
            t0 = np.minimum(t_lo, t_hi).max(-1).clip(min=0.0)
            t1 = np.maximum(t_lo, t_hi).min(-1)
            touched = set()
            tmax = float((dims * np.abs(s)).max()) * 2.0
            for t in np.arange(0.0, tmax, 0.25):
                m = (t >= t0) & (t <= t1)
                if not m.any():
                    continue
                p = org[m] + t * dirn[m]
                c = np.clip((p // 16.0).astype(np.int64), 0,
                            [mx - 1, my - 1, mz - 1])
                touched.update(((cz * my + cy) * mx + cx)
                               for cx, cy, cz in c)
            vis = set(int(i) for i in view_cells(mc, cam, 24, 24,
                                                 scale=scale))
            assert touched <= vis, (eye, scale, sorted(touched - vis)[:8])

    def test_lazy_matches_full_build(self):
        """LazyBrickCache.ensure_view must make the in-frustum pool content
        identical to the eager build's, and ensure_all must complete it."""
        from instantvnr_tpu.render.brickcache import LazyBrickCache
        from instantvnr_tpu.render.camera import Camera

        vol, tf, mc, field, state = _scene()
        want = build_brick_cache(field, state.params, mc, dilate=1)
        lazy = LazyBrickCache(field, state.params, mc, dilate=1)
        assert lazy.n_decoded == 0
        cam = Camera(eye=(4.8, 3.2, -64), center=(0, 0, 0), up=(0, 1, 0),
                     fovy=45)
        n1 = lazy.ensure_view(cam, 24, 24)
        assert n1 > 0 and lazy.n_decoded == n1
        assert lazy.ensure_view(cam, 24, 24) == 0  # steady state: no-op

        # sampling inside the frustum equals the eager pool exactly
        occ = occupied_cells(mc, dilate=0)
        from instantvnr_tpu.render.brickcache import view_cells

        vis = np.intersect1d(occ, view_cells(mc, cam, 24, 24))
        rng = np.random.default_rng(5)
        mx, my, _ = (int(d) for d in mc.dims)
        pick = vis[rng.integers(0, vis.size, 256)]
        base = np.stack([pick % mx, (pick // mx) % my, pick // (mx * my)],
                        -1).astype(np.float32) * 16.0
        p = jnp.asarray(base + rng.random((256, 3), np.float32) * 16.0) \
            / jnp.asarray([float(d) for d in mc.volume_dims])
        np.testing.assert_array_equal(
            np.asarray(brick_sample_fn(lazy.ctx, p)),
            np.asarray(brick_sample_fn(want, p)))

        # complete the pool: every brick present, whole domain matches
        lazy.ensure_all()
        assert lazy.n_decoded == lazy.n_bricks
        q = jnp.asarray(rng.random((512, 3), np.float32))
        np.testing.assert_array_equal(
            np.asarray(brick_sample_fn(lazy.ctx, q)),
            np.asarray(brick_sample_fn(want, q)))

    def test_light_swept_cells_superset_and_strictness(self):
        """light_swept_cells must contain every cell reachable from the
        source set along +light (Monte-Carlo oracle over random ray
        offsets), while remaining a strict subset of the grid for a corner
        source — the bound that keeps lazy SSH lazy (VERDICT r3 #8)."""
        import dataclasses as dc

        from instantvnr_tpu.accel.macrocell import MACROCELL_SIZE
        from instantvnr_tpu.render.brickcache import light_swept_cells

        vol, tf, mc, field, state = _scene(train=0)
        # fake a big grid: 6x5x7 macrocells
        mx, my, mz = 6, 5, 7
        mc_big = dc.replace(
            mc,
            volume_dims=(mx * MACROCELL_SIZE, my * MACROCELL_SIZE,
                         mz * MACROCELL_SIZE),
            value_lo=jnp.zeros((mz, my, mx)),
            value_hi=jnp.ones((mz, my, mx)),
            max_opacity=jnp.ones((mz, my, mx)))
        # corner source: the 2x2x2 block at the origin
        src = np.array([(z * my + y) * mx + x
                        for z in range(2) for y in range(2)
                        for x in range(2)], np.int32)
        rng = np.random.default_rng(11)
        for light in ([1.0, 0.0, 0.0], [0.7, 0.9, 0.4], [-0.3, 0.8, -0.5],
                      rng.normal(size=3)):
            swept = light_swept_cells(mc_big, src, light)
            mask = np.zeros(mx * my * mz, bool)
            mask[swept] = True
            # superset oracle: random origins inside source cells, random
            # distances along +light — the containing cell must be swept
            o_cell = src[rng.integers(0, src.size, 4096)]
            ox = o_cell % mx + rng.random(4096)
            oy = (o_cell // mx) % my + rng.random(4096)
            oz = o_cell // (mx * my) + rng.random(4096)
            t = rng.random(4096) * 40.0
            d = np.asarray(light, np.float64)
            d = d / np.linalg.norm(d)
            px, py, pz = ox + t * d[0], oy + t * d[1], oz + t * d[2]
            inb = ((px >= 0) & (px < mx) & (py >= 0) & (py < my)
                   & (pz >= 0) & (pz < mz))
            hit = ((px.astype(int) + mx * (py.astype(int)
                    + my * pz.astype(int)))[inb])
            assert mask[hit].all(), light
            # strictness: a corner source swept along one direction never
            # needs the whole grid
            assert swept.size < mx * my * mz, light

    def test_streaming_cache_info_reports_quality(self):
        """The decoded-grade default of NEURAL_WAVEFRONT* must be VISIBLE:
        streaming_cache_info reports the resolved policy + quality class
        (VERDICT r3 weak #6 / next #9)."""
        from instantvnr_tpu.api import (NeuralVolume, RenderMode,
                                        SimpleVolume, VNRenderer)
        from instantvnr_tpu.config import (EncodingConfig, ModelConfig,
                                           NetworkConfig)
        from instantvnr_tpu.data import synthetic_volume as _sv

        vol = _sv((32, 32, 32), kind="vorts")
        cfg = ModelConfig(
            encoding=EncodingConfig(n_levels=4, n_features_per_level=4,
                                    log2_hashmap_size=12, base_resolution=4),
            network=NetworkConfig(n_neurons=32, n_hidden_layers=2))
        nv = NeuralVolume(cfg, simple=SimpleVolume(vol), train_batch=4096)
        nv.train(10)
        for policy, resolved, quality in (
                ("brick", "brick", "decoded-trilinear"),
                # auto/lazy decode on the exact-convention lattice (the
                # mode-5 field, +6 dB vs exact at identical cost)
                ("auto", "brick", "exact-trilinear"),
                ("lazy", "lazy", "exact-trilinear"),
                ("none", "none", "exact-network")):
            r = VNRenderer(nv, 16, 16, mode=RenderMode.NEURAL_WAVEFRONT,
                           streaming_cache=policy)
            info = r.streaming_cache_info
            assert info["policy"] == policy
            assert info["resolved"] == resolved, info
            assert info["quality"] == quality, info
        # non-streaming modes report n/a
        r2 = VNRenderer(nv, 16, 16, mode=RenderMode.DECODED_SLAB)
        assert r2.streaming_cache_info["quality"] == "n/a"

    def test_lazy_empty_tf_reaches_steady_state(self):
        """A fully TF-empty scene's dummy brick has no LUT entry, so
        ensure_* can never mark it — the always-decoded orphan pre-mark
        must keep n_decoded == n_bricks through init/set_params/refresh
        (else api.VNRenderer's lazy guard re-runs view culling forever)."""
        import dataclasses as dc

        from instantvnr_tpu.render.brickcache import LazyBrickCache

        vol, tf, mc, field, state = _scene(train=0)
        mc0 = dc.replace(mc, max_opacity=jnp.zeros_like(mc.max_opacity))
        lazy = LazyBrickCache(field, state.params, mc0, dilate=0)
        assert lazy.n_bricks == 1 and lazy.n_decoded == 1
        assert lazy.ensure_all() == 0
        lazy.set_params(state.params)
        assert lazy.n_decoded == 1
        assert lazy.refresh(state.params, budget_bricks=4) == 0
        assert lazy.n_decoded == 1
        p = jnp.asarray(np.random.default_rng(2).random((32, 3), np.float32))
        np.testing.assert_array_equal(
            np.asarray(brick_sample_fn(lazy.ctx, p)), 0.0)

    def test_facade_lazy_policy(self):
        """streaming_cache='lazy' renders the same frame as 'brick' while
        decoding only the view's bricks; refresh_params restales the pool;
        SSH completes it (shadow rays leave the frustum)."""
        from instantvnr_tpu.api import (NeuralVolume, RenderMode,
                                        SimpleVolume, VNRenderer)
        from instantvnr_tpu.config import (EncodingConfig, ModelConfig,
                                           NetworkConfig)
        from instantvnr_tpu.data import synthetic_volume as _sv
        from instantvnr_tpu.render.camera import Camera

        vol = _sv((32, 32, 32), kind="vorts")
        cfg = ModelConfig(
            encoding=EncodingConfig(n_levels=4, n_features_per_level=4,
                                    log2_hashmap_size=12, base_resolution=4),
            network=NetworkConfig(n_neurons=32, n_hidden_layers=2))
        nv = NeuralVolume(cfg, simple=SimpleVolume(vol), train_batch=4096)
        nv.train(30)
        # a close-up camera that sees only part of the volume, so laziness
        # is observable (not all bricks decoded)
        cam = Camera(eye=(22, 18, -26), center=(8, 8, 8), up=(0, 1, 0),
                     fovy=35)
        frames = {}
        for policy in ("auto", "lazy"):
            r = VNRenderer(nv, 24, 24, mode=RenderMode.NEURAL_WAVEFRONT)
            r.set_streaming_cache(policy)
            r.set_camera(cam)
            r.render()
            frames[policy] = r.mapframe()
            if policy == "lazy":
                assert r._lazy is not None
                assert 0 < r._lazy.n_decoded <= r._lazy.n_bricks
                lazy_renderer = r
        assert frames["lazy"][..., 3].max() > 0.05
        np.testing.assert_array_equal(frames["lazy"], frames["auto"])

        # params move → refresh restales; the next render re-decodes the
        # visible set and matches a fresh brick build of the new params
        nv.train(15)
        lazy_renderer.refresh_params()
        assert lazy_renderer._lazy.n_decoded == 0
        lazy_renderer.render()
        got = lazy_renderer.mapframe()
        # mirror the lazy renderer's history (render → refresh → render) so
        # the per-frame jitter key sequence is identical
        rb = VNRenderer(nv, 24, 24, mode=RenderMode.NEURAL_WAVEFRONT)
        rb.set_streaming_cache("auto")
        rb.set_camera(cam)
        rb.render()
        rb.refresh_params()
        rb.render()
        np.testing.assert_array_equal(got, rb.mapframe())

        # budgeted lazy refresh: bounded per-call hitch, converges to the
        # full restale result once the cursor has covered the decoded set
        nv.train(10)
        lz = lazy_renderer._lazy
        before = lz.n_decoded
        lazy_renderer.refresh_params(budget_bricks=2)
        assert lz.n_decoded == before  # 2 restaled AND re-decoded in place
        for _ in range(lz.n_bricks):  # drive the cursor over everything
            lazy_renderer.refresh_params(budget_bricks=2)
        lazy_renderer.render()
        got2 = lazy_renderer.mapframe()
        rb2 = VNRenderer(nv, 24, 24, mode=RenderMode.NEURAL_WAVEFRONT,
                         streaming_cache="auto")
        rb2.set_camera(cam)
        # mirror the jitter key history: lazy_renderer has rendered twice
        # before this comparison frame, with an accumulation reset between
        for _ in range(2):
            rb2.render()
            rb2.refresh_params()
        rb2.render()
        np.testing.assert_array_equal(got2, rb2.mapframe())

        # SSH shading decodes frustum ∪ light-swept cells — a strict
        # subset on a corner view — and stays bit-identical to the eager
        # pool (shadow rays never leave the swept set)
        rs = VNRenderer(nv, 16, 16, mode=RenderMode.NEURAL_WAVEFRONT_SSH)
        rs.set_streaming_cache("lazy")
        rs.set_camera(cam)
        rs.render()
        # (strictness of the subset is asserted on a bigger grid in
        # test_light_swept_cells_*; this 2x2x2-cell scene sweeps to all)
        assert 0 < rs._lazy.n_decoded <= rs._lazy.n_bricks
        got_ssh = rs.mapframe()
        assert np.isfinite(got_ssh).all()
        re = VNRenderer(nv, 16, 16, mode=RenderMode.NEURAL_WAVEFRONT_SSH,
                        streaming_cache="auto")
        re.set_camera(cam)
        re.render()
        np.testing.assert_array_equal(got_ssh, re.mapframe())

    def test_gradient_shading_frame_matches(self):
        """Gradient probes cross cell walls — dilate=1 must keep the shaded
        brick frame equal to the decoded-grid shaded frame."""
        from instantvnr_tpu.render.camera import Camera
        from instantvnr_tpu.render.raymarch import RaymarchSettings
        from instantvnr_tpu.render.renderer import (
            Renderer,
            reference_sample_fn,
        )

        vol, tf, mc, field, state = _scene()
        dims = tuple(int(d) for d in mc.volume_dims)
        decoded = decode_volume(field, state.params, dims)
        ctx = build_brick_cache(field, state.params, mc, dilate=1)
        cam = Camera(eye=(0.15 * dims[0], 0.1 * dims[1], -2.0 * dims[2]),
                     center=(0, 0, 0), up=(0, 1, 0), fovy=45)

        frames = {}
        for name, fn, c in (("decoded", reference_sample_fn, decoded),
                            ("brick", brick_sample_fn, ctx)):
            r = Renderer(16, 16, mc, tf, fn, sample_ctx=c,
                         settings=RaymarchSettings(n_iters=4,
                                                   shading="gradient"),
                         seed=3)
            r.set_camera(cam)
            r.render()
            frames[name] = np.asarray(r._frame)
        np.testing.assert_allclose(frames["brick"], frames["decoded"],
                                   rtol=0, atol=1e-4)


class TestSupersampledPool:
    """The "hq" 2×-supersampled pool: a NESTED refinement of the decode
    lattice (texel 2g reproduces the 1× texel), so it agrees with the 1×
    pool on the original lattice and cuts trilinear error ~h² between
    texels — closing most of the brick-vs-exact-network quality gap at
    the same one-gather-per-sample cost."""

    def _exact(self, field, params, p, dims):
        """The continuous field both pools approximate: the network at the
        decode-lattice convention coordinate (clip(p(N−1)) + 0.5)/N."""
        d = jnp.asarray([float(x) for x in dims], jnp.float32)
        u = jnp.clip(p * (d - 1.0), 0.0, d - 1.0)
        from instantvnr_tpu.models.network import network_apply

        return network_apply(params, (u + 0.5) / d, field)[:, 0]

    def _occupied_points(self, mc, n=512, seed=0):
        occ = occupied_cells(mc, dilate=0)
        rng = np.random.default_rng(seed)
        mx, my, _ = (int(d) for d in mc.dims)
        pick = occ[rng.integers(0, occ.size, n)]
        cx, cy, cz = pick % mx, (pick // mx) % my, pick // (mx * my)
        base = np.stack([cx, cy, cz], -1).astype(np.float32) * 16.0
        pos_v = base + rng.random((n, 3), np.float32) * 16.0
        return jnp.asarray(pos_v) / jnp.asarray(
            [float(d) for d in mc.volume_dims])

    def test_nested_lattice_agrees_with_1x_at_original_texels(self):
        """At the original texel positions p = g/(N−1) the ss=2 pool must
        reproduce the 1× pool (texel 2g holds the same network sample)."""
        from instantvnr_tpu.render.brickcache import ctx_supersample

        vol, tf, mc, field, state = _scene()
        ctx1 = build_brick_cache(field, state.params, mc, dilate=1)
        ctx2 = build_brick_cache(field, state.params, mc, dilate=1,
                                 supersample=2)
        assert ctx_supersample(ctx1) == 1
        assert ctx_supersample(ctx2) == 2
        n = tuple(int(d) for d in mc.volume_dims)
        occ = occupied_cells(mc, dilate=0)
        rng = np.random.default_rng(3)
        mx, my, _ = (int(d) for d in mc.dims)
        pick = occ[rng.integers(0, occ.size, 256)]
        cx, cy, cz = pick % mx, (pick // mx) % my, pick // (mx * my)
        g = (np.stack([cx, cy, cz], -1) * 16
             + rng.integers(0, 16, (256, 3)))  # integer texels in-cell
        p = jnp.asarray(g.astype(np.float32)
                        / (np.asarray(n, np.float32) - 1.0))
        v1 = np.asarray(brick_sample_fn(ctx1, p))
        v2 = np.asarray(brick_sample_fn(ctx2, p))
        np.testing.assert_allclose(v2, v1, rtol=0, atol=2e-5)

    def test_quality_improves_vs_exact_network(self):
        """Between texels the ss=2 pool must be substantially closer to
        the exact network than the 1× pool (h² trilinear error)."""
        vol, tf, mc, field, state = _scene(train=120)
        ctx1 = build_brick_cache(field, state.params, mc, dilate=1)
        ctx2 = build_brick_cache(field, state.params, mc, dilate=1,
                                 supersample=2)
        p = self._occupied_points(mc, n=2048, seed=11)
        dims = tuple(int(d) for d in mc.volume_dims)
        want = np.asarray(self._exact(field, state.params, p, dims))
        err1 = np.mean((np.asarray(brick_sample_fn(ctx1, p)) - want) ** 2)
        err2 = np.mean((np.asarray(brick_sample_fn(ctx2, p)) - want) ** 2)
        # h² error ⇒ ~16× MSE; demand ≥4× (12 dB theoretical, ≥6 dB floor)
        assert err2 < err1 / 4.0, (err1, err2)

    def test_refresh_preserves_supersample(self):
        """refresh_brick_pool on an ss ctx re-decodes at the ss lattice
        (geometry read from the ctx) — equal to a fresh ss build."""
        from instantvnr_tpu.render.brickcache import refresh_brick_pool

        vol, tf, mc, field, state = _scene(train=30)
        ctx = build_brick_cache(field, state.params, mc, dilate=1,
                                supersample=2)
        state2 = train_steps(field, vol.data, state, 30, 4096)
        cur = 0
        while True:
            ctx, cur = refresh_brick_pool(field, state2.params, ctx,
                                          start=cur, n_bricks=3)
            if cur == 0:
                break
        fresh = build_brick_cache(field, state2.params, mc, dilate=1,
                                  supersample=2)
        # compare by SAMPLING: raw pools differ only in dead rows (corner
        # -pack shift spill, chunked vs whole-pool — never addressed)
        p = self._occupied_points(mc, n=1024, seed=5)
        np.testing.assert_allclose(np.asarray(brick_sample_fn(ctx, p)),
                                   np.asarray(brick_sample_fn(fresh, p)),
                                   rtol=0, atol=2e-5)

    def test_lazy_supersample_matches_eager(self):
        from instantvnr_tpu.render.brickcache import (LazyBrickCache,
                                                      ctx_supersample)

        vol, tf, mc, field, state = _scene(train=30)
        lazy = LazyBrickCache(field, state.params, mc, dilate=1,
                              supersample=2)
        assert ctx_supersample(lazy.ctx) == 2
        lazy.ensure_all()
        eager = build_brick_cache(field, state.params, mc, dilate=1,
                                  supersample=2)
        # sampling comparison — dead-row spill differs (see refresh test)
        p = self._occupied_points(mc, n=1024, seed=6)
        np.testing.assert_allclose(
            np.asarray(brick_sample_fn(lazy.ctx, p)),
            np.asarray(brick_sample_fn(eager, p)), rtol=0, atol=2e-5)

    def test_facade_hq_policy(self, monkeypatch):
        """streaming_cache='hq' builds the 2× f16 pool under the memory
        gate, degrades to the 1× pool past it, and reports the factor in
        streaming_cache_info."""
        from instantvnr_tpu.api import (NeuralVolume, RenderMode,
                                        SimpleVolume, VNRenderer)
        from instantvnr_tpu.config import (EncodingConfig, ModelConfig,
                                           NetworkConfig)
        from instantvnr_tpu.data import synthetic_volume as _sv
        from instantvnr_tpu.render.brickcache import brick_cache_bytes

        vol = _sv((32, 32, 32), kind="vorts")
        cfg = ModelConfig(
            encoding=EncodingConfig(n_levels=4, n_features_per_level=4,
                                    log2_hashmap_size=12, base_resolution=4),
            network=NetworkConfig(n_neurons=32, n_hidden_layers=2))
        nv = NeuralVolume(cfg, simple=SimpleVolume(vol), train_batch=4096)
        nv.train(30)
        mc = nv.simple.macrocell if hasattr(nv.simple, "macrocell") \
            else nv.macrocell
        mb2 = brick_cache_bytes(mc, dtype=jnp.float16,
                                supersample=2) / 2**20

        monkeypatch.setenv("VNR_BRICK_MAX_MB", str(mb2 * 2))
        r = VNRenderer(nv, 16, 16, mode=RenderMode.NEURAL_WAVEFRONT,
                       streaming_cache="hq")
        info = r.streaming_cache_info
        assert info["resolved"] == "brick"
        assert info["supersample"] == 2, info
        assert info["lattice"] == "exact", info
        assert info["pool_dtype"] == "float16"
        r.render()
        assert np.isfinite(np.asarray(r._impl._frame)).all()

        # memory-gated degrade: hq budget too small → 1× f16 pool
        monkeypatch.setenv("VNR_BRICK_MAX_MB", str(mb2 * 0.5))
        r2 = VNRenderer(nv, 16, 16, mode=RenderMode.NEURAL_WAVEFRONT,
                        streaming_cache="hq")
        info2 = r2.streaming_cache_info
        assert info2["supersample"] == 1, info2
        # the degrade keeps the exact lattice (the policy's whole point)
        assert info2["lattice"] == "exact", info2
        r2.render()
        assert np.isfinite(np.asarray(r2._impl._frame)).all()

    def test_exact_convention_approximates_exact_sampler(self):
        """convention="exact" (the hq policy's lattice) must converge to
        the REAL exact sampler net(p) (make_neural_sample_fn — raw
        coords, method_raymarching.cu:707-716), which the decoded-lattice
        pool cannot: the decoding modes' cell-centered remap warps the
        field by up to half a voxel (trilinear.py docstring), a floor no
        amount of supersampling removes."""
        from instantvnr_tpu.models.network import render_params
        from instantvnr_tpu.render.renderer import make_neural_sample_fn

        vol, tf, mc, field, state = _scene(train=120)
        p = self._occupied_points(mc, n=2048, seed=13)
        exact_fn = make_neural_sample_fn(field)
        want = np.asarray(exact_fn(render_params(state.params, field), p))

        def mse(ctx):
            return float(np.mean(
                (np.asarray(brick_sample_fn(ctx, p)) - want) ** 2))

        e_dec1 = mse(build_brick_cache(field, state.params, mc, dilate=1))
        e_dec2 = mse(build_brick_cache(field, state.params, mc, dilate=1,
                                       supersample=2))
        e_ex2 = mse(build_brick_cache(field, state.params, mc, dilate=1,
                                      supersample=2, convention="exact"))
        # the warp floor: decoded-lattice supersampling stalls…
        assert e_dec2 > e_ex2 * 2, (e_dec1, e_dec2, e_ex2)
        # …while the exact lattice actually converges
        assert e_ex2 < e_dec1 / 4, (e_dec1, e_ex2)
