"""PnP solvers: GAP-TV warm start and the two-stage online-adaptive ADMM."""

from adaptivepnp_sci_tpu.solvers.gap_tv import GapTVConfig, gap_tv  # noqa: F401
from adaptivepnp_sci_tpu.solvers.two_stage_admm import (  # noqa: F401
    ADMMConfig,
    two_stage_admm,
)
