"""pointclouds_tpu: a TPU-native point-cloud processing framework.

Brand-new JAX/XLA/Pallas implementation with the same capabilities and
Python API surface as the Rust reference library ``pointclouds-rs``. See
SURVEY.md at the repo root for the structural map of the reference and the
TPU-first design decisions.

Importing this package enables JAX x64 support: the grid-hash spatial index
packs 3D cell coordinates into int64 keys. All hot-path compute remains f32.
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: first-time TPU compiles of the larger
# pipeline programs take tens of seconds; cache them across processes.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.expanduser("~/.cache/pointclouds_tpu_jax"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these options
        pass

from .api import (  # noqa: E402
    IcpResult,
    knn,
    knn_indices,
    radius_search,
    radius_search_unsorted,
    PlaneResult,
    PointCloud,
    apply_transform,
    estimate_normals,
    estimate_normals_with_viewpoint,
    euclidean_cluster,
    icp_point_to_plane,
    icp_point_to_point,
    passthrough_filter,
    radius_outlier_removal,
    ransac_plane,
    ransac_plane_seeded,
    read_las,
    read_pcd,
    read_ply,
    statistical_outlier_removal,
    voxel_downsample,
    write_pcd,
    write_pcd_binary,
    write_ply,
    write_ply_binary,
)

__version__ = "0.1.0"

__all__ = [
    "IcpResult",
    "knn",
    "knn_indices",
    "radius_search",
    "radius_search_unsorted",
    "PlaneResult",
    "PointCloud",
    "apply_transform",
    "estimate_normals",
    "estimate_normals_with_viewpoint",
    "euclidean_cluster",
    "icp_point_to_plane",
    "icp_point_to_point",
    "passthrough_filter",
    "radius_outlier_removal",
    "ransac_plane",
    "ransac_plane_seeded",
    "read_las",
    "read_pcd",
    "read_ply",
    "statistical_outlier_removal",
    "voxel_downsample",
    "write_pcd",
    "write_pcd_binary",
    "write_ply",
    "write_ply_binary",
]
