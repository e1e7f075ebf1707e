from .equipartition import Equipartition, EpStatus, ep_stats
from .cost_kernel import (CandidateCostLw, CandidateCostSw, CkdEquipartition)
