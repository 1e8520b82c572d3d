// marlin_tpu native expression evaluator.
//
// C++ counterpart of the reference's FParser usage for deck-level scalar
// expressions (reference: src/tensor_computes/ParsedCompute.C:104-126
// evaluates constant_expressions with FunctionParserADBase, and the MOOSE
// HIT ${fparse ...} brace expressions).  Implements the same grammar as
// marlin_tpu/expression.py (reference include/utils/MarlinExpressionParser.h:
// 383-427):
//
//   EXPRESSION  <- (IDENT ':=' LOGICAL ';')* LOGICAL
//   LOGICAL     <- COMPARISON (('|' / '&') COMPARISON)*
//   COMPARISON  <- ADDITIVE (COMP_OP ADDITIVE)?
//   ADDITIVE    <- MULTITIVE (('+' / '-') MULTITIVE)*
//   MULTITIVE   <- UNARY (('*' / '/' / '%') UNARY)*
//   UNARY       <- (('-' / '!') UNARY) / POWER
//   POWER       <- PRIMARY ('^' POWER)?        (right associative)
//   PRIMARY     <- FUNCTION / NUMBER / VARIABLE / '(' LOGICAL ')'
//
// Exposed through a minimal C ABI (ctypes-friendly); used by
// marlin_tpu/native.py for fast host-side deck expansion and as a
// differential-testing oracle for the Python engine.
//
// Build: g++ -O2 -shared -fPIC -o libmarlin_native.so expr_eval.cpp

#include <cctype>
#include <cmath>
#include <cstring>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

namespace
{

struct EvalError : std::runtime_error
{
  using std::runtime_error::runtime_error;
};

class Parser
{
public:
  Parser(std::string text, const std::map<std::string, double> & env)
    : _s(std::move(text)), _pos(0), _env(env)
  {
  }

  double parse()
  {
    // let-bindings
    while (true)
    {
      const auto save = _pos;
      skipWs();
      if (isIdentStart(peek()))
      {
        const auto name = ident();
        skipWs();
        if (match(":="))
        {
          const double value = logical();
          skipWs();
          if (!match(";"))
            throw EvalError("expected ';' after let binding");
          _locals[name] = value;
          continue;
        }
      }
      _pos = save;
      break;
    }
    const double v = logical();
    skipWs();
    if (_pos != _s.size())
      throw EvalError("trailing characters");
    return v;
  }

private:
  const std::string _s;  // owned: callers pass char* temporaries
  std::size_t _pos;
  const std::map<std::string, double> & _env;
  std::map<std::string, double> _locals;

  char peek() const { return _pos < _s.size() ? _s[_pos] : '\0'; }
  char peek2() const { return _pos + 1 < _s.size() ? _s[_pos + 1] : '\0'; }

  void skipWs()
  {
    while (_pos < _s.size() && std::isspace(static_cast<unsigned char>(_s[_pos])))
      ++_pos;
  }

  bool match(const char * tok)
  {
    skipWs();
    const auto n = std::strlen(tok);
    if (_s.compare(_pos, n, tok) == 0)
    {
      _pos += n;
      return true;
    }
    return false;
  }

  static bool isIdentStart(char c) { return std::isalpha(static_cast<unsigned char>(c)) || c == '_'; }
  static bool isIdentChar(char c) { return std::isalnum(static_cast<unsigned char>(c)) || c == '_'; }

  std::string ident()
  {
    skipWs();
    std::string out;
    while (_pos < _s.size() && isIdentChar(_s[_pos]))
      out += _s[_pos++];
    if (out.empty())
      throw EvalError("expected identifier");
    return out;
  }

  double logical()
  {
    double left = comparison();
    while (true)
    {
      skipWs();
      if (match("&"))
      {
        const double right = comparison();
        left = (left != 0.0 && right != 0.0) ? 1.0 : 0.0;
      }
      else if (match("|"))
      {
        const double right = comparison();
        left = (left != 0.0 || right != 0.0) ? 1.0 : 0.0;
      }
      else
        break;
    }
    return left;
  }

  double comparison()
  {
    const double left = additive();
    skipWs();
    if (match("<="))
      return left <= additive() ? 1.0 : 0.0;
    if (match(">="))
      return left >= additive() ? 1.0 : 0.0;
    if (match("=="))
      return left == additive() ? 1.0 : 0.0;
    if (match("!="))
      return left != additive() ? 1.0 : 0.0;
    // careful: '<' must not swallow '<='; handled by order above
    if (peek() == '<')
    {
      ++_pos;
      return left < additive() ? 1.0 : 0.0;
    }
    if (peek() == '>')
    {
      ++_pos;
      return left > additive() ? 1.0 : 0.0;
    }
    return left;
  }

  double additive()
  {
    double left = multitive();
    while (true)
    {
      skipWs();
      if (peek() == '+')
      {
        ++_pos;
        left += multitive();
      }
      else if (peek() == '-')
      {
        ++_pos;
        left -= multitive();
      }
      else
        break;
    }
    return left;
  }

  double multitive()
  {
    double left = unary();
    while (true)
    {
      skipWs();
      if (peek() == '*')
      {
        ++_pos;
        left *= unary();
      }
      else if (peek() == '/')
      {
        ++_pos;
        left /= unary();
      }
      else if (peek() == '%')
      {
        ++_pos;
        left = std::fmod(left, unary());
      }
      else
        break;
    }
    return left;
  }

  double unary()
  {
    skipWs();
    if (peek() == '-')
    {
      ++_pos;
      return -unary();
    }
    if (peek() == '!')
    {
      ++_pos;
      return unary() != 0.0 ? 0.0 : 1.0;
    }
    return power();
  }

  double power()
  {
    const double base = primary();
    skipWs();
    if (peek() == '^')
    {
      ++_pos;
      const double expo = power(); // right associative
      return std::pow(base, expo);
    }
    return base;
  }

  double primary()
  {
    skipWs();
    const char c = peek();
    if (c == '(')
    {
      ++_pos;
      const double v = logical();
      if (!match(")"))
        throw EvalError("expected ')'");
      return v;
    }
    if (std::isdigit(static_cast<unsigned char>(c)) ||
        (c == '.' && std::isdigit(static_cast<unsigned char>(peek2()))))
      return number();
    if (isIdentStart(c))
    {
      const auto name = ident();
      skipWs();
      if (peek() == '(')
      {
        ++_pos;
        std::vector<double> args;
        skipWs();
        if (peek() != ')')
        {
          args.push_back(logical());
          while (match(","))
            args.push_back(logical());
        }
        if (!match(")"))
          throw EvalError("expected ')' in call");
        return call(name, args);
      }
      const auto lit = _locals.find(name);
      if (lit != _locals.end())
        return lit->second;
      const auto it = _env.find(name);
      if (it != _env.end())
        return it->second;
      if (name == "pi")
        return M_PI;
      if (name == "e")
        return M_E;
      throw EvalError("unbound variable '" + name + "'");
    }
    throw EvalError(std::string("unexpected character '") + c + "'");
  }

  double number()
  {
    std::size_t used = 0;
    const double v = std::stod(_s.substr(_pos), &used);
    // reject forms like 1.2.3 the same way the python tokenizer does: stod
    // stops at the second '.', the trailing chars fail in parse()
    _pos += used;
    return v;
  }

  double call(const std::string & name, const std::vector<double> & a)
  {
    if (a.size() == 1)
    {
      const double x = a[0];
      if (name == "sin") return std::sin(x);
      if (name == "cos") return std::cos(x);
      if (name == "tan") return std::tan(x);
      if (name == "sinh") return std::sinh(x);
      if (name == "cosh") return std::cosh(x);
      if (name == "tanh") return std::tanh(x);
      if (name == "asin") return std::asin(x);
      if (name == "acos") return std::acos(x);
      if (name == "atan") return std::atan(x);
      if (name == "asinh") return std::asinh(x);
      if (name == "acosh") return std::acosh(x);
      if (name == "atanh") return std::atanh(x);
      if (name == "exp") return std::exp(x);
      if (name == "log") return std::log(x);
      if (name == "log10") return std::log10(x);
      if (name == "log2") return std::log2(x);
      if (name == "sqrt") return std::sqrt(x);
      if (name == "abs") return std::fabs(x);
      if (name == "ceil") return std::ceil(x);
      if (name == "floor") return std::floor(x);
      if (name == "round") return std::round(x);
      if (name == "trunc") return std::trunc(x);
      if (name == "erf") return std::erf(x);
    }
    else if (a.size() == 2)
    {
      if (name == "min") return std::min(a[0], a[1]);
      if (name == "max") return std::max(a[0], a[1]);
      if (name == "atan2") return std::atan2(a[0], a[1]);
      if (name == "hypot") return std::hypot(a[0], a[1]);
      if (name == "pow") return std::pow(a[0], a[1]);
    }
    else if (a.size() == 3 && name == "if")
      return a[0] != 0.0 ? a[1] : a[2];
    throw EvalError("unknown function '" + name + "'/" + std::to_string(a.size()));
  }
};

thread_local std::string g_error;

} // namespace

extern "C"
{
  // Evaluate `expr` with `n` named scalars. Returns NaN and sets an error
  // flag on failure; marlin_last_error() returns the message.
  double marlin_eval(const char * expr,
                     const char ** names,
                     const double * values,
                     int n,
                     int * err)
  {
    try
    {
      std::map<std::string, double> env;
      for (int i = 0; i < n; ++i)
        env[names[i]] = values[i];
      Parser p(expr, env);
      const double v = p.parse();
      if (err)
        *err = 0;
      return v;
    }
    catch (const std::exception & e)
    {
      g_error = e.what();
      if (err)
        *err = 1;
      return std::nan("");
    }
  }

  const char * marlin_last_error() { return g_error.c_str(); }

  // Batched evaluation: one expression over `count` environments laid out
  // as values[count][n].  Used for host-side function sampling.
  void marlin_eval_batch(const char * expr,
                         const char ** names,
                         const double * values,
                         int n,
                         int count,
                         double * out,
                         int * err)
  {
    try
    {
      std::map<std::string, double> env;
      for (int c = 0; c < count; ++c)
      {
        for (int i = 0; i < n; ++i)
          env[names[i]] = values[c * n + i];
        Parser p(expr, env);
        out[c] = p.parse();
      }
      if (err)
        *err = 0;
    }
    catch (const std::exception & e)
    {
      g_error = e.what();
      if (err)
        *err = 1;
    }
  }
}
