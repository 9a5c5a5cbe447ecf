from bfqzip_tpu.cli import main

raise SystemExit(main())
