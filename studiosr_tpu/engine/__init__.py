from studiosr_tpu.engine.evaluator import Evaluator, Evaluator2, benchmark
from studiosr_tpu.engine.trainer import Trainer

__all__ = ["Evaluator", "Evaluator2", "benchmark", "Trainer"]
