from .main.program import main

main()
