from receiptanalyzerpipeline_spark.cli import main

raise SystemExit(main())
