"""Physical-plan design: checkpoint/lineage/resume and plan inspection.

The reference parser is resumable only at document granularity (it is a
stream; killing it loses the in-flight document).  At 10^12 pages the
unit of restart must be a *partition of the corpus* — see ``lineage``.
``explain`` holds the plan-shape assertions used by tests to keep
pushdown / broadcast / shuffle properties from regressing.
"""

from .lineage import CheckpointedExtraction  # noqa: F401
