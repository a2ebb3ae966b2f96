from parquet_to_clickhouse_schema_spark.cli import main

raise SystemExit(main())
