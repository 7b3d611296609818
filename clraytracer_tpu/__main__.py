from clraytracer_tpu.cli import main

raise SystemExit(main())
