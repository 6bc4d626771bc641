from bokego_tpu.parallel import mesh
from bokego_tpu.parallel.selfplay import SelfplayResult, selfplay, selfplay_sharded

__all__ = ["mesh", "selfplay", "selfplay_sharded", "SelfplayResult"]
