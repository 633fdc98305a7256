"""diive_spark — a from-scratch PySpark-native time-series rollup, downsample
and retention engine with the query/data-processing capabilities of the
``diive`` reference library (https://github.com/inkenbrandt/diive).

The reference processes ONE pandas Series (a sensor's time series) at a time;
this engine runs the same math on millions of independent series in parallel.
The canonical data model is a long-format DataFrame::

    (key: string, ts: timestamp, value: double, ...flags)

where ``key`` identifies a series (a ``url`` for Common-Crawl-style page
snapshots, a sensor/variable name for flux data) and ``ts`` is the END of the
averaging interval (the reference's canonical database convention, see
/root/reference/diive/pkgs/qaqc/meteoscreening.py:97-100).

Design rules (see SURVEY.md §7):
  * declarative DataFrame expressions wherever possible (whole-stage codegen);
  * grouped Arrow/pandas UDFs (``applyInPandas``) only for kernels Spark's
    built-ins cannot express (iterate-until-converged flagging, Gorilla
    compression);
  * no per-row Python, no driver-side collects in any operator;
  * every operator is scale-free: state is bounded per series chunk, skew is
    handled by salting + AQE, joins that can broadcast do broadcast.
"""

__version__ = "0.1.0"
