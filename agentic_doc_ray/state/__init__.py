from agentic_doc_ray.state.manifest import (
    load_manifest,
    plan_partitions,
    run_resumable,
)

__all__ = ["load_manifest", "plan_partitions", "run_resumable"]
