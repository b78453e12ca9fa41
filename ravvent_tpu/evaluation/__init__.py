from ravvent_tpu.evaluation.basecall import BasecallEngine  # noqa: F401
from ravvent_tpu.evaluation.mapping import MappingEvaluator  # noqa: F401
from ravvent_tpu.evaluation.performance import PerformanceEvaluator  # noqa: F401
