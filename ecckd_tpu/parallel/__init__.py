from .sharded_average import (
    sharded_average_od_to_gpoints,
    sharded_average_od_to_gpoints_multihost,
    streaming_sharded_average_od_to_gpoints,
    streaming_sharded_average_od_to_gpoints_multihost)
from .mesh import (make_mesh, profile_sharding, spectral_sharding,
                   replicated, pad_to_multiple)
