"""geo_ray — Ray-Data-native spatial-join + tiling engine.

A from-scratch re-creation of motis-project/geo's geometry surface as
vectorized NumPy/Arrow kernels (``geo_ray.kernels``) lifted into Ray Data
batch stages (``geo_ray.stages``) and end-to-end pipelines
(``geo_ray.pipelines``). See SURVEY.md for the full operator inventory.
"""

__version__ = "0.1.0"
