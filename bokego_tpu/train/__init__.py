from bokego_tpu.train import checkpoints, data, genvals, reinforce, sl

__all__ = ["checkpoints", "data", "genvals", "reinforce", "sl"]
