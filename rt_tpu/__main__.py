from rt_tpu.cli import main

raise SystemExit(main())
