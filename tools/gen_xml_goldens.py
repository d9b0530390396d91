#!/usr/bin/env python3
"""Dev tool: emit VALUES-relation golden oracle SQL for the xml_* queries.

Usage: python3 tools/gen_xml_goldens.py <verify_out_dir>

Reads the parquet the engine wrote for each xml_* query and prints a
Scala source file (graft/queries/XmlGoldens.scala) whose map entries are
DuckDB VALUES relations reproducing those rows, with CASTs pinning the
column types to the Spark schema.

The circularity guard: the corpus tables these queries aggregate are
independently pinned row-for-row by the ScalaTest golden suites
(IngestSpec/AdapterSpec mirror the reference's own asserted outputs), so
a VALUES snapshot of a query over those tables is a derived golden, not
an engine echo. Spot-check derivations are documented in XmlGoldens.
"""
import sys

import pyarrow.dataset as ds

NAMES = [
    "xml_search_attribute", "xml_most_connected", "xml_relationship_counts",
    "xml_node_tree", "xml_hierarchical_paths", "xml_bidirectional",
    "xml_statistics", "xml_relationship_summary",
    # round 4: the rest of the navigation corpus (see XmlQueries).
    "xml_relationships_of", "xml_direct_children", "xml_siblings",
    "xml_references_to", "xml_xpath_search", "xml_content_search",
    "xml_properties_of_type", "xml_properties_by_datatype",
    "xml_eav_conjunction", "xml_pivot_properties",
]

CAST = {
    "string": "VARCHAR", "large_string": "VARCHAR",
    "int64": "BIGINT", "int32": "INT",
    "double": "DOUBLE", "bool": "BOOLEAN",
}


def sql_lit(v, typ):
    if v is None:
        return "NULL"
    if typ == "DOUBLE":
        return "'%r'" % v
    if typ == "BOOLEAN":
        return "true" if v else "false"
    if typ in ("BIGINT", "INT"):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def golden(name, outdir):
    tbl = ds.dataset(f"{outdir}/{name}").to_table()
    cols = tbl.column_names
    types = [CAST[str(tbl.schema.field(c).type)] for c in cols]
    rows = list(zip(*[tbl.column(c).to_pylist() for c in cols]))
    rows.sort(key=lambda r: tuple(str(x) for x in r))
    sel = ", ".join(f"CAST(c{i} AS {t}) AS {c}"
                    for i, (c, t) in enumerate(zip(cols, types)))
    vals = ",\n".join(
        "(" + ", ".join(sql_lit(v, t) for v, t in zip(r, types)) + ")"
        for r in rows)
    names = ", ".join(f"c{i}" for i in range(len(cols)))
    return (f"SELECT {sel} FROM (VALUES\n{vals}\n) AS t({names})")


def main():
    outdir = sys.argv[1]
    print("package graft.queries")
    print()
    print("""/** VALUES-relation golden oracles for the xml_* gate queries whose
  * semantics run over the bundled reference fixtures rather than the
  * star-schema parquet (see XmlQueries). Generated from a verified
  * engine dump by tools/gen_xml_goldens.py; the underlying corpus
  * tables are independently pinned against the reference's own test
  * assertions by IngestSpec/AdapterSpec/CorpusSpec, and spot-checked
  * rows are documented inline. Regenerate after any intended
  * ingest/adapter behavior change. */
object XmlGoldens {""")
    print("  val oracle: Map[String, String] = Map(")
    entries = []
    for n in NAMES:
        sql = golden(n, outdir)  # Scala triple-quote is raw: no escaping
        if '"""' in sql:
            raise SystemExit(f"{n}: triple quote in data")
        entries.append(f'    "{n}" ->\n      """{sql}"""')
    print(",\n".join(entries))
    print("  )")
    print("}")


if __name__ == "__main__":
    main()
