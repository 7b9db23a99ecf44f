from . import layers, mlp, rnn

__all__ = ["layers", "mlp", "rnn"]
