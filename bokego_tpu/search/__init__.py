from bokego_tpu.search import mcts, playout, tree

__all__ = ["mcts", "playout", "tree"]
