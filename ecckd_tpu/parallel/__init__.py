from .sharded_average import sharded_average_od_to_gpoints
from .mesh import (make_mesh, profile_sharding, spectral_sharding,
                   replicated, pad_to_multiple)
