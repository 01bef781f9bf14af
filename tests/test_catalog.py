from clickhouse_forecasting_spark.catalog import (
    ParquetCatalog,
    forecast_table_name,
    is_forecast_output,
)


def test_forecast_table_name_strips_bucket_prefix():
    # C6 rule, forecast_script.py:121-124
    assert forecast_table_name("bucket_bounce_rate") == "bucket_forecast_bounce_rate"
    assert forecast_table_name("daily_orders") == "bucket_forecast_daily_orders"
    assert forecast_table_name(" bucket_x ") == "bucket_forecast_x"


def test_is_forecast_output():
    assert is_forecast_output("bucket_forecast_foo")
    assert not is_forecast_output("bucket_foo")


def test_list_and_describe(spark, sf_dir):
    cat = ParquetCatalog(spark, sf_dir)
    tables = cat.list_tables()
    assert "lineitem" in tables and "orders" in tables
    cols = dict(cat.describe("orders"))
    assert cols["o_orderkey"] == "bigint"
    assert cat.table_exists("orders") and not cat.table_exists("nope")


def test_write_drop_roundtrip(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path))
    df = spark.range(5).withColumnRenamed("id", "x")
    cat.write_table(df, "t1", order_by=None)
    assert cat.table_exists("t1")
    assert cat.table("t1").count() == 5
    cat.drop_table("t1")
    assert not cat.table_exists("t1")
