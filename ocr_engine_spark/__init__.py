"""ocr_engine_spark — a PySpark-native main-content extraction engine.

Brand-new engine with the capabilities of mrlasdt/ocr-engine (reference, read-only at
/root/reference), re-expressed over tables of multi-turn agent transcripts:

- ``kernel``     pure no-Spark oracle kernels (the semantics)
- ``operators``  Spark DataFrame operators (extraction, dedup, similarity, text analysis)
- ``sources``    readers/writers + the deterministic synthetic transcript generator
- ``functions``  SQL-registered scalar functions
- ``streaming``  Structured Streaming wrapper (v2 scope)
"""

__version__ = "0.1.0"
