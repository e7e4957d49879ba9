"""PnP solvers: GAP-TV warm start and the two-stage online-adaptive ADMM
(single-measurement, batched, tiled, fused-sequence, single-dispatch, and
grayscale variants)."""

from adaptivepnp_sci_tpu.solvers.gap_deep import (  # noqa: F401
    GapDeepConfig,
    gap_deep,
)
from adaptivepnp_sci_tpu.solvers.gap_tv import GapTVConfig, gap_tv  # noqa: F401
from adaptivepnp_sci_tpu.solvers.gray import GrayConfig, gap_denoise_gray  # noqa: F401
from adaptivepnp_sci_tpu.solvers.two_stage_admm import (  # noqa: F401
    ADMMConfig,
    DmSpec,
    make_dm_spec,
    two_stage_admm,
    two_stage_admm_batched,
    two_stage_admm_sequence,
    two_stage_admm_tiled,
)
