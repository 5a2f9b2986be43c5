package graft

/** Back-compat alias only — the single documented extensions entry point
  * is [[graft.functions.GraftExtensions]] (the five SQL functions PLUS
  * the [[graft.functions.HammingIdentityFold]] optimizer rule). This name
  * survives solely so an existing
  * `spark.sql.extensions=graft.GraftExtensions` config keeps the full
  * behavior instead of silently losing the rule; new wiring should name
  * the functions-package class directly.
  */
@deprecated("use graft.functions.GraftExtensions", "0.7")
class GraftExtensions extends graft.functions.GraftExtensions
