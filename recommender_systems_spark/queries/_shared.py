"""Constants shared across query modules.

Lives in a dependency-free module so that sibling query modules can
share tuning constants without importing each other: a module-level
cross-import (graph ← ml) breaks whenever the IMPORTED module is the
process's first entry into the package — registry's import chain then
re-enters it partially initialized (observed: `import queries.ml` →
registry → graph → partially-initialized ml → ImportError).
"""

# Item-item CF / co-occurrence graph (queries.ml.m_item_item_cooc and
# queries.graph.g_pagerank build the same capped-history edge list).
CF_CAP = 40        # per-user history cap bounding the pair explode
CF_MIN_COOC = 2    # minimum co-occurrence for an edge
