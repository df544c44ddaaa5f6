"""wrf_to_geodataframe_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of C-H-Simpson/wrf_to_geodataframe.

The reference (``/root/reference``) converts gridded climate-model output to
geospatial dataframes with an eager numpy/pandas/geopandas pipeline.  This
package re-expresses every one of its operators (SURVEY.md §2) as lazy
PySpark DataFrame transforms so Catalyst/Tungsten/AQE pick the physical
strategy, plus the large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) the reference lacks.

Design stance (SURVEY.md §7):
- composable DataFrame transforms, not a new engine layer;
- geometry = plain coordinate columns where possible (boxes, bboxes) and
  WKB ``BinaryType`` + vertex-array columns where not (Voronoi cells);
- no custom Catalyst rules; AQE + broadcast hints only;
- UDFs only where built-ins genuinely can't express the semantics
  (half-plane Voronoi, convex polygon overlay), always Arrow-batched.
"""

from wrf_to_geodataframe_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
