"""LLM-data-pipeline operators (north-star adds per BASELINE.json):
dedup (exact / MinHash-LSH / n-gram Jaccard / SimHash / embedding-cosine),
similarity search, text analysis, multimodal column plumbing."""

from . import bpe  # noqa: F401
from . import corpus_ext  # noqa: F401
from . import curate  # noqa: F401
from . import curation_ext  # noqa: F401
from . import dedup  # noqa: F401
from . import incremental  # noqa: F401
from . import multimodal  # noqa: F401
from . import packing  # noqa: F401
from . import pipeline_ext  # noqa: F401
from . import similarity  # noqa: F401
from . import text  # noqa: F401
