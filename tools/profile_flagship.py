"""Per-stage wall-clock profile of the flagship pipeline.

Usage: python tools/profile_flagship.py [n_convs] [master]

Prints one line per stage (generation, series derivation, SAX+combo
reduction, driver orchestration, assignment+PL) so scaling regressions can
be attributed immediately. The serial stages (combo collect, greedy merge,
mapping build) are the Amdahl term of the two-cluster-size rule — watch
their share shrink as n_convs grows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kapra_timeseries_anonymization_spark.functions.sax_udfs import (  # noqa: E402
    make_sax_levels_udf,
    pattern_loss_udf,
)
from kapra_timeseries_anonymization_spark.operators.envelope import (  # noqa: E402
    envelope_agg,
)
from kapra_timeseries_anonymization_spark.operators.kapra import (  # noqa: E402
    kapra_anonymize,
)
from kapra_timeseries_anonymization_spark.session import build_session  # noqa: E402
from kapra_timeseries_anonymization_spark.sources.transcripts import (  # noqa: E402
    conv_turn_rate_series,
    synth_transcripts,
)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    master = sys.argv[2] if len(sys.argv) > 2 else "local[16]"
    s = build_session("profile-flagship", master=master)
    marks = [("start", time.perf_counter())]

    t = synth_transcripts(s, n_convs=n_convs, mean_turns=24).persist()
    n_turns = t.count()
    marks.append(("generate+persist", time.perf_counter()))

    series = conv_turn_rate_series(t, 8).persist()
    n_series = series.count()
    marks.append(("series_derivation", time.perf_counter()))

    sax_udf = make_sax_levels_udf(list(range(3, 9)), 4)
    base = (
        series.select("original_index", "values")
        .withColumn("sax_vec", sax_udf(F.col("values")))
        .withColumn("combo_key", F.concat_ws("\x1f", F.col("sax_vec")))
        .persist()
    )
    base.count()
    marks.append(("sax_udf", time.perf_counter()))

    n_combos = envelope_agg(
        base, ["combo_key"], "values", 8, with_vl=False
    ).count()
    marks.append(("combo_reduction", time.perf_counter()))

    res = kapra_anonymize(series, K=8, P=2, sax_level=8, t=8)
    nrec = res.records.count()
    marks.append(("full_kapra", time.perf_counter()))

    print(f"n_convs={n_convs} turns={n_turns} series={n_series} "
          f"combos={n_combos} records={nrec} groups={len(res.groups)}")
    for (name, t1), (_, t0) in zip(marks[1:], marks[:-1]):
        print(f"  {name:>18}: {t1 - t0:7.2f}s")
    s.stop()


if __name__ == "__main__":
    main()
