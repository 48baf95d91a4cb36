from .chunked_mesh import MeshChunkedAllPairs
from .mesh import MeshEngine, make_mesh
from .multihost import global_mesh, init_multihost, is_coordinator
