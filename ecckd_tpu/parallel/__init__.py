from .mesh import (make_mesh, profile_sharding, spectral_sharding,
                   replicated, pad_to_multiple)
