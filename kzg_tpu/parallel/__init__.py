"""Multi-chip parallelism: mesh construction and sharded KZG kernels."""

from .sharded import (
    make_mesh,
    sharded_msm_g1,
    sharded_msm_g1_fixed,
    sharded_precompute_g1_tables,
    sharded_evaluate,
    sharded_setup_g1,
    sharded_setup_g2,
    sharded_commit_and_prove,
)

__all__ = [
    "make_mesh",
    "sharded_msm_g1",
    "sharded_msm_g1_fixed",
    "sharded_precompute_g1_tables",
    "sharded_evaluate",
    "sharded_setup_g1",
    "sharded_setup_g2",
    "sharded_commit_and_prove",
]
