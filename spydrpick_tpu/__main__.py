from spydrpick_tpu.cli import main

raise SystemExit(main())
