from .server import SimilarityServer
from .rpc import RpcServer
from .client import ClientConnection, InteractiveClient
