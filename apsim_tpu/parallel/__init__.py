from .mesh import MeshEngine, make_mesh
