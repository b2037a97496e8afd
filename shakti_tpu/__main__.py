from shakti_tpu.cli import main

raise SystemExit(main())
