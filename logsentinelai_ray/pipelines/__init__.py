from .queries import QUERY_REGISTRY  # noqa: F401
from .oracles import ORACLE_SQL  # noqa: F401
