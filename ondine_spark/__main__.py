from ondine_spark.cli import main

raise SystemExit(main())
