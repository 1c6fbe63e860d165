"""Fused pipeline vs the exact per-op API path: the two must agree on
KITTI-style scenes (this is the fused path's correctness gate, see
pointclouds_tpu/pipelines/kitti.py docstring)."""

import numpy as np
import pytest

import pointclouds_tpu as pc
from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.pipelines.kitti import (
    extract_clusters,
    kitti_obstacle_pipeline,
)
from pointclouds_tpu.pipelines.scenes import aerial_scene, kitti_scene


def run_api_path(data, seed):
    cloud = pc.PointCloud.from_numpy(data)
    ds = pc.voxel_downsample(cloud, 0.15)
    cleaned = pc.statistical_outlier_removal(ds, 20, 2.0)
    plane = pc.ransac_plane_seeded(cleaned, 0.15, 500, seed)
    obstacles = cleaned.select_inverse(plane.inliers)
    clusters = pc.euclidean_cluster(obstacles, 0.8, 10, 20_000)
    return ds, cleaned, plane, obstacles, clusters


def run_fused_path(data, seed):
    arrs = make_cloud_arrays(data)
    out = kitti_obstacle_pipeline(
        arrs.xyz,
        arrs.valid,
        np.float32(0.15),
        np.float32(2.0),
        np.float32(0.15),
        seed,
        np.float32(0.8),
        sor_k=20,
        ransac_iters=500,
        obstacle_cap=8192,
    )
    clusters = extract_clusters(out, 10, 20_000)
    return out, clusters


def density_preserving_small_scene(seed, scale):
    """Cropped full-scale KITTI window: production point density AND object
    geometry (the fused path's SOR cell size assumes the voxel-0.15
    production density), at a CPU-friendly point count. ``scale`` sets the
    crop window size."""
    data = kitti_scene(seed=seed, scale=1.0)
    half_x = 30.0 * (scale * 2.5) ** 0.5
    half_y = 20.0 * (scale * 2.5) ** 0.5
    keep = (np.abs(data[:, 0]) <= half_x) & (np.abs(data[:, 1]) <= half_y)
    return np.ascontiguousarray(data[keep])


def test_fused_matches_api_path_small_kitti():
    data = density_preserving_small_scene(42, 0.08)  # ~5.4K pts, CPU-friendly
    seed = 1234
    ds, cleaned, plane, obstacles, api_clusters = run_api_path(data, seed)
    out, fused_clusters = run_fused_path(data, seed)

    # Step parity: voxel downsample count is exact
    assert int(np.asarray(out.downsampled_valid).sum()) == ds.len()
    # SOR keep set: the fused path's bounded neighbor search may classify
    # borderline sparse points differently (documented in
    # pipelines/kitti.py); require agreement within 1%. The binding gate is
    # the geometric cluster equality below.
    fused_sor = int(np.asarray(out.cleaned_valid).sum())
    assert abs(fused_sor - cleaned.len()) <= max(3, cleaned.len() // 100)
    # Same ground plane (up to sign), inlier count within 5%
    dot = abs(float(np.dot(np.asarray(out.plane_normal), plane.normal)))
    assert dot > 0.999
    fused_inl = int(np.asarray(out.inlier_mask).sum())
    assert abs(fused_inl - len(plane.inliers)) <= len(plane.inliers) * 0.05
    # The pipeline-level gate (BASELINE config 5): identical cluster
    # structure. Row indices shift between the paths when the upstream
    # keep-sets differ by a few noise points, so compare the clusters'
    # actual point coordinates (both paths share bitwise-identical voxel
    # centroids).
    assert [len(c) for c in fused_clusters] == [len(c) for c in api_clusters]
    api_pts = obstacles.to_numpy()
    fused_obs = np.asarray(out.centroids)[np.asarray(out.obstacle_src)]
    fused_valid_slots = np.nonzero(np.asarray(out.obstacle_valid))[0]
    for fc, ac in zip(fused_clusters, api_clusters):
        a = np.sort(api_pts[ac], axis=0)
        f = np.sort(fused_obs[fused_valid_slots[fc]], axis=0)
        np.testing.assert_array_equal(a, f)


def test_fused_detects_three_obstacles_full_scene():
    data = density_preserving_small_scene(42, 0.25)  # ~17K pts
    out, clusters = run_fused_path(data, 99)
    assert not bool(out.obstacle_overflow)
    # 2 cars + 1 pedestrian
    assert len(clusters) == 3
    sizes = sorted(len(c) for c in clusters)
    assert sizes[2] > sizes[0]  # cars bigger than pedestrian


def test_fused_deterministic():
    data = density_preserving_small_scene(3, 0.05)
    _, c1 = run_fused_path(data, 7)
    _, c2 = run_fused_path(data, 7)
    assert c1 == c2


def test_aerial_pipeline_api_path():
    """Aerial workload (spec: examples/python/aerial_lidar.py:143-186)
    exercised at reduced scale through the public API."""
    data = aerial_scene(seed=7, scale=0.03)
    cloud = pc.PointCloud.from_numpy(data)
    ds = pc.voxel_downsample(cloud, 0.5)
    n = pc.estimate_normals(ds, 15)
    plane = pc.ransac_plane_seeded(n, 0.3, 300, 5)
    objects = n.select_inverse(plane.inliers)
    clusters = pc.euclidean_cluster(objects, 2.0, 20, 100_000)
    assert ds.len() > 0
    assert len(plane.inliers) > ds.len() * 0.1  # a terrain band fits the plane
    assert len(clusters) >= 3  # buildings + trees found


@pytest.mark.slow
def test_fused_matches_api_path_production_scale():
    """Full-scale fused-vs-exact parity (VERDICT r2 honesty gap): the
    68K-point synthetic KITTI scene is past the density where pass-1 SOR
    stops certifying every row (`sor_certified` can go False at production
    scale), so this validates the documented removal-biased semantics
    still yield geometrically identical clusters vs the exact API path."""
    data = kitti_scene(seed=42, scale=1.0)
    assert len(data) >= 50_000
    seed = 77
    ds, cleaned, plane, obstacles, api_clusters = run_api_path(data, seed)
    out, fused_clusters = run_fused_path(data, seed)

    assert int(np.asarray(out.downsampled_valid).sum()) == ds.len()
    fused_sor = int(np.asarray(out.cleaned_valid).sum())
    assert abs(fused_sor - cleaned.len()) <= max(3, cleaned.len() // 100)
    dot = abs(float(np.dot(np.asarray(out.plane_normal), plane.normal)))
    assert dot > 0.999
    # Geometric cluster equality — the binding gate at full scale.
    assert [len(c) for c in fused_clusters] == [len(c) for c in api_clusters]
    api_pts = obstacles.to_numpy()
    fused_obs = np.asarray(out.centroids)[np.asarray(out.obstacle_src)]
    fused_valid_slots = np.nonzero(np.asarray(out.obstacle_valid))[0]
    for fc, ac in zip(fused_clusters, api_clusters):
        a = np.sort(api_pts[ac], axis=0)
        f = np.sort(fused_obs[fused_valid_slots[fc]], axis=0)
        np.testing.assert_array_equal(a, f)
