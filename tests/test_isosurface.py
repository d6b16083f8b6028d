import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instantvnr_tpu.ops.isosurface import (
    extract_isosurface,
    extract_isosurface_network,
    save_obj,
)


def sphere_grid(n=32, r=0.35):
    z, y, x = np.meshgrid(*(np.linspace(0, 1, n),) * 3, indexing="ij")
    return np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2) \
        .astype(np.float32), r


class TestMarchingTets:
    def test_sphere_vertices_on_surface(self):
        n = 32
        dist, r = sphere_grid(n)
        verts, faces = extract_isosurface(dist, r)
        assert len(verts) > 1000
        assert len(faces) == len(verts) // 3
        # vertices (voxel coords) → normalized grid coords
        p = verts / (n - 1)
        d = np.linalg.norm(p - 0.5, axis=-1)
        # every vertex within one voxel of the isosurface
        assert np.abs(d - r).max() < 1.5 / n
        assert np.abs(d - r).mean() < 0.3 / n

    def test_sphere_area(self):
        """Total triangle area ≈ 4πr² (in normalized units)."""
        n = 48
        dist, r = sphere_grid(n)
        verts, faces = extract_isosurface(dist, r)
        p = (verts / (n - 1)).reshape(-1, 3, 3)
        e1 = p[:, 1] - p[:, 0]
        e2 = p[:, 2] - p[:, 0]
        area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum()
        expect = 4 * np.pi * r * r
        assert abs(area - expect) / expect < 0.05, (area, expect)

    def test_no_surface_when_iso_outside_range(self):
        dist, _ = sphere_grid(16)
        verts, _ = extract_isosurface(dist, 99.0)
        assert len(verts) == 0

    def test_watertight_edges(self):
        """Each interior edge is shared by exactly 2 triangles (manifold)."""
        dist, r = sphere_grid(24)
        verts, faces = extract_isosurface(dist, r)
        v = verts.reshape(-1, 3, 3).round(4)
        edges = {}
        for tri in v:
            for i in range(3):
                a, b = tuple(tri[i]), tuple(tri[(i + 1) % 3])
                k = (min(a, b), max(a, b))
                edges[k] = edges.get(k, 0) + 1
        counts = np.array(list(edges.values()))
        # a closed marching-tets surface: every edge appears exactly twice
        assert (counts == 2).mean() > 0.99, (counts == 2).mean()

    def test_network_extraction_matches_grid(self):
        """Extracting from the network (slab-decoded) == extracting from the
        fully decoded grid."""
        from instantvnr_tpu.config import (
            EncodingConfig,
            ModelConfig,
            NetworkConfig,
        )
        from instantvnr_tpu.models import NeuralField, decode_volume
        from instantvnr_tpu.models.trainer import create_train_state

        cfg = ModelConfig(
            encoding=EncodingConfig(n_levels=4, n_features_per_level=4,
                                    log2_hashmap_size=12, base_resolution=4),
            network=NetworkConfig(n_neurons=32, n_hidden_layers=2),
        )
        field = NeuralField.from_config(cfg)
        state = create_train_state(jax.random.PRNGKey(0), field)
        dims = (16, 16, 16)
        grid = decode_volume(field, state.params, dims)
        iso = float(jnp.mean(grid))
        v1, _ = extract_isosurface(grid, iso, slab=8)
        v2, _ = extract_isosurface_network(field, state.params, dims, iso,
                                           slab=8)
        assert v1.shape == v2.shape
        np.testing.assert_allclose(v1, v2, atol=1e-4)

    def test_save_obj(self, tmp_path):
        dist, r = sphere_grid(12)
        verts, faces = extract_isosurface(dist, r)
        p = tmp_path / "iso.obj"
        save_obj(verts, faces, str(p))
        text = p.read_text()
        assert text.count("\nv ") + text.startswith("v ") == len(verts)
        assert text.count("\nf ") == len(faces)
