"""`python -m waddleml_spark` → the CLI (init / ls / serve / explain)."""

from waddleml_spark.cli import main

raise SystemExit(main())
