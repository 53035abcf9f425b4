"""Ray-Data-native transcript parse → enrich → route → aggregate engine
(reference semantics: fluent-plugin-kubernetes_metadata_filter) plus
training-data operators (dedup / similarity / text analysis / multimodal).

Public surface:

    from fluent_plugin_kubernetes_metadata_filter_ray import (
        PipelineConfig, DEFAULT_CONFIG, build_enriched, run_flagship,
    )
"""

from .state import raypatch as _raypatch

_raypatch.apply()  # Ray 2.49 hash-shuffle schema-broadcast race (see module doc)

from .config import DEFAULT_CONFIG, PipelineConfig  # noqa: F401
from .pipelines.flagship import build_enriched, read_transcripts, run_flagship  # noqa: F401
