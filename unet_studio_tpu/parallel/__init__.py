from .mesh import make_mesh, data_sharding, replicate
