from bokego_tpu.gtp.engine import GTPEngine
from bokego_tpu.gtp.process import GTPProcess, gtp_match

__all__ = ["GTPEngine", "GTPProcess", "gtp_match"]
