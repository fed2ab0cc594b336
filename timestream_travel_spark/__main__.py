from timestream_travel_spark.cli import main

raise SystemExit(main())
