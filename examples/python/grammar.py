"""Grammar-constrained decoding: regex and Yacc CFG (ref examples grammar)."""
import sys

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.grammar.recognizer import Constraint

runner = Runner(sys.argv[1])
sp = SamplingParams(max_len=48, temperature=0.7)
resp = runner.send_completion_request(
    "Give me a phone number: ", sp,
    constraint=Constraint.regex(r"\(\d{3}\) \d{3}-\d{4}"),
)
print(resp.choices[0].text)

JSON_Y = r'''
%start value
%%
SKIP : "/[ \t\r\n]+/" ;
value : object | array | STRING | NUMBER | "true" | "false" | "null" ;
object : "{" "}" | "{" members "}" ;
members : pair | members "," pair ;
pair : STRING ":" value ;
array : "[" "]" | "[" elements "]" ;
elements : value | elements "," value ;
STRING : '/"[^"]*"/' ;
NUMBER : "/-?[0-9]+(\.[0-9]+)?/" ;
'''
resp = runner.send_completion_request(
    "Reply with JSON: ", sp, constraint=Constraint.yacc(JSON_Y))
print(resp.choices[0].text)
