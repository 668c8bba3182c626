"""kapra_timeseries_anonymization_spark — a PySpark-native time-series
rollup + downsample + retention engine with (k,P)-anonymous pattern grouping.

Built from scratch on the public PySpark DataFrame API. The algorithmic
semantics (PAA, SAX, envelope/VL, KAPRA bottom-up and naive top-down
(k,P)-anonymization) follow the public reference
`federissoo/KAPRA-TimeSeries-Anonymization`; the execution architecture is
idiomatic Spark: declarative DataFrame plans, vectorized pandas/Arrow UDFs,
driver-side control only over compact summaries.
"""

__version__ = "0.1.0"
