from raytracing_c_tpu.cli import main

raise SystemExit(main())
