from stampede_to_fresco_etl_spark.cli import main

raise SystemExit(main())
