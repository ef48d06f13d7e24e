"""safe_control_tpu — a TPU-native safety-filter + MPC framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
tkkim-robot/safe_control: robot dynamics models, control barrier functions
(CBF-QP, MPC-CBF, optimal-decay variants), shielding (gatekeeper/MPS/
backup-CBF), perception, environments and tracking orchestration — all as
pure functions that ``vmap``/``pjit`` across thousands of robots and a TPU
pod slice.
"""

from safe_control_tpu.core.spec import RobotSpec, make_spec  # noqa: F401
from safe_control_tpu.core.types import pad_obstacles  # noqa: F401

__version__ = "0.1.0"
