from .schedule import build_schedule
from .simulation import Algorithm, Simulation, run
from .callbacks import CALLBACK_REGISTRY
from .pgmc import BLANPG, VPG
from .tempering import ReplicaExchange, replica_exchange
