from ilqr_tpu.utils.io import read_trajectory_csv, write_trajectory_csv
from ilqr_tpu.utils.timing import PhaseTimer

__all__ = ["read_trajectory_csv", "write_trajectory_csv", "PhaseTimer"]
