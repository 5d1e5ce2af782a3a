"""ccm_spark — a PySpark-native analytics engine with the capabilities of
sragli/ccm (Convergent Cross Mapping for causal inference on nonlinear time
series, Sugihara et al. 2012), rebuilt Spark-first.

Reference surface (see SURVEY.md §2 for the full operator inventory):
  - ``CCM`` / ``CCMConfig``  — API shim mirroring CCM.new/cross_map/
    bidirectional_ccm (reference lib/ccm.ex:20,48,79)
  - ``plans.cross_map``      — the whole bidirectional sweep as ONE Catalyst plan
  - ``oracle``               — seeded numpy ground truth for tests
  - ``generators``           — G1/G2 coupled logistic-map data generators
  - ``pipeline``             — large-scale training-data ops (dedup, similarity
    search, text analysis, multimodal) beyond the reference's own surface
  - ``significance``         — surrogate-data null model for cross-map skill
    plus the fleet screening scans and simplex forecasting (extension;
    the reference reports skill with no significance test)
  - ``multivariate``         — block CCM, multiview ensembles, S-map
    interaction tracking, multispatial CCM (extensions)
  - ``network``              — causal-network discovery over a series corpus
"""

from ccm_spark.config import CCMConfig, generate_lib_sizes
from ccm_spark.ccm import CCM

__all__ = ["CCM", "CCMConfig", "generate_lib_sizes"]
__version__ = "0.1.0"
