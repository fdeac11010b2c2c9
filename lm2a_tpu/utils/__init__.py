from lm2a_tpu.utils.logging import TrainLogger

__all__ = ["TrainLogger"]
