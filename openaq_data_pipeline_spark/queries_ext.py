"""Extension operator queries (training-data pipeline ops): dedup,
similarity search, text analysis, multimodal plumbing. Registered
into the same catalog as the core queries. Populated incrementally —
see operators/dedup.py, operators/similarity.py, operators/text.py.
"""

from __future__ import annotations
