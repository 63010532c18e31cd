"""rel_ray — Ray-Data-native record-linkage / entity-resolution engine.

Public API surface; see README.md and SURVEY.md for the architecture.
Importing this package never initializes Ray (driver contract).
"""

from .config import DEFAULT_CONFIG, PipelineConfig

__all__ = [
    "DEFAULT_CONFIG",
    "PipelineConfig",
    "run_linkage",
    "run_linkage_checkpointed",
    "pairwise_f1",
    "fit_threshold",
    "generate_corpus",
]


def __getattr__(name):  # lazy: keep `import rel_ray` free of ray.data imports
    if name == "run_linkage":
        from .pipelines.linkage import run_linkage
        return run_linkage
    if name == "run_linkage_checkpointed":
        from .pipelines.checkpointed import run_linkage_checkpointed
        return run_linkage_checkpointed
    if name == "pairwise_f1":
        from .pipelines.eval import pairwise_f1
        return pairwise_f1
    if name == "fit_threshold":
        from .pipelines.eval import fit_threshold
        return fit_threshold
    if name == "generate_corpus":
        from .synth import generate_corpus
        return generate_corpus
    raise AttributeError(name)
