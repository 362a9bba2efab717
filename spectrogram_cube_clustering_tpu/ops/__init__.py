"""Pure array ops: normalizers, Student-t soft assignment, losses.

Everything here is a jit-safe pure function over jnp arrays (no Python state,
static shapes), so it composes under vmap/jit/shard_map.
"""

from spectrogram_cube_clustering_tpu.ops.normalize import (
    sample_normalization,
    sample_norm_cent,
    vec_norm,
    make_normalizer,
)
from spectrogram_cube_clustering_tpu.ops.student_t import (
    student_t_assignment,
    target_distribution,
)
from spectrogram_cube_clustering_tpu.ops.losses import (
    mse,
    kld_sum,
    dec_loss,
)

__all__ = [
    "sample_normalization", "sample_norm_cent", "vec_norm", "make_normalizer",
    "student_t_assignment", "target_distribution",
    "mse", "kld_sum", "dec_loss",
]
