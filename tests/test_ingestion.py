"""Spark-side tests for CSV landing + inference over reference-shaped fixtures
(FIXTURES.md §B: encounters.csv exercises every inference edge; dirty.csv
exercises the quarantine path)."""

from __future__ import annotations

import pytest

from covid_19_data_engineering_spark.inference import (
    apply_inferred_schema,
    infer_table_schema,
)
from covid_19_data_engineering_spark.sources.csv import (
    read_csv_landing,
    table_name_for,
)

# year_col mixes a true date with an out-of-int16 integer -> the lattice's
# date+integer tiebreak; person_id mixes smallint- and integer-range values.
# NOTE a bare year like "2021" classifies as SMALLINT (numeric branch runs
# before date parsing), not date — the tiebreak needs an actual date token.
ENCOUNTERS_CSV = """encounter_id,empi_id,person_id,is_covid,flag01,admit_date,updated_at,charge,notes,year_col
1001,0042,12,t,0,2021-03-15,2021-03-15 14:22:05,12.50,mixed,2021-03-15
999999999999,0107,40001,f,1,2021-04-01,2021-04-01 09:10:11,3,7,40000
8,0007,99,true,0,2021-05-20,2021-05-20 23:59:59,0.25,,2021-06-01
"""

EXPECTED_TYPES = {
    "encounter_id": "bigint",
    "empi_id": "text",
    "person_id": "integer",
    "is_covid": "boolean",
    "flag01": "smallint",
    "admit_date": "date",
    "updated_at": "timestamp",
    "charge": "numeric",
    "notes": "text",
    "year_col": "integer",
}


@pytest.fixture(scope="module")
def encounters_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "PH_F_Encounter.csv"
    p.write_text(ENCOUNTERS_CSV)
    return str(p)


def test_table_name_derivation(encounters_path):
    assert table_name_for(encounters_path) == "ph_f_encounter"
    assert table_name_for("/x/Map_Between_Claim_Id_Encounter_Id.csv") == (
        "map_between_claim_id_encounter_id"
    )


def test_landing_all_text(spark, encounters_path):
    good, bad = read_csv_landing(spark, encounters_path)
    assert good.count() == 3
    assert bad.count() == 0
    assert all(dt == "string" for _, dt in good.dtypes)


@pytest.mark.parametrize("mode", ["sample", "full"])
def test_inference_over_fixture(spark, encounters_path, mode):
    good, _ = read_csv_landing(spark, encounters_path)
    inferred = infer_table_schema(good, mode=mode)
    assert inferred == EXPECTED_TYPES


def test_apply_schema_casts(spark, encounters_path):
    good, _ = read_csv_landing(spark, encounters_path)
    typed = apply_inferred_schema(good, infer_table_schema(good))
    dtypes = dict(typed.dtypes)
    assert dtypes["encounter_id"] == "bigint"
    assert dtypes["is_covid"] == "boolean"
    assert dtypes["admit_date"] == "date"
    assert dtypes["updated_at"] == "timestamp"
    assert dtypes["charge"] == "double"
    assert dtypes["empi_id"] == "string"
    rows = {r["encounter_id"]: r for r in typed.collect()}
    assert rows[1001]["is_covid"] is True
    assert rows[1001]["charge"] == 12.50
    assert rows[1001]["empi_id"] == "0042"  # zero-padding preserved
    assert str(rows[1001]["admit_date"]) == "2021-03-15"


DIRTY_CSV = """name,qty,price
O'Brien,5,1.25
"quoted,comma",2,0.50
plain,7,2.00
"""


def test_quarantine_good_rows_land(spark, tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text(DIRTY_CSV)
    good, bad = read_csv_landing(spark, str(p))
    names = {r["name"] for r in good.collect()}
    # embedded quote and quoted comma both parse; all rows land
    assert "O'Brien" in names and "quoted,comma" in names and "plain" in names
    assert bad.count() == 0


def test_quarantine_explains_failures(spark, tmp_path):
    """Quarantined rows must say WHY they failed (reference logs row content
    + error per bad row, load_tables_daily.py:201-203) and where they came
    from, so a data engineer can triage the quarantine table."""
    p = tmp_path / "broken.csv"
    p.write_text('name,qty\ngood,1\n"unclosed quote,oops\nalso_good,2\n')
    _, bad = read_csv_landing(spark, str(p))
    rows = bad.collect()
    assert rows, "unclosed-quote row must be quarantined"
    assert set(bad.columns) == {"raw_record", "error_reason", "source_file"}
    by_record = {r["raw_record"]: r for r in rows}
    quoted = by_record['"unclosed quote,oops']
    assert quoted["error_reason"] == "unbalanced_quote"
    assert quoted["source_file"].endswith("broken.csv")
